"""JAX/Pallas DSP ops: the compute core of the framework.

Replaces the reference's native third-party dependencies (WORLD/pyworld,
SPTK/pysptk, bandmat, librosa; SURVEY.md §2.9) with batched on-device
kernels.
"""
