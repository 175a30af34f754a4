"""WORLD-style vocoder analysis/synthesis as batched JAX kernels.

Replaces pyworld (WORLD C++) usage in the reference
(``WorldFeatLabelGen.world_extract_features``
WorldFeatLabelGen.py:778-807, ``world_features_to_raw`` :909-945):

* :mod:`f0`        — F0 tracking (DIO/Harvest role): batched normalised
                     cross-correlation + Viterbi continuity, all scans.
* :mod:`cheaptrick`— pitch-adaptive spectral envelope (CheapTrick role).
* :mod:`d4c`       — band aperiodicity estimation (D4C role).
* :mod:`synthesis` — phase-coherent harmonic + noise synthesis.

The algorithms are reformulated as masked fixed-grid computations so XLA
sees static shapes and dense batched FFts/matmuls; numerical parity with
pyworld is asserted to tolerance on the reference fixtures, not
bit-exactly.
"""

from idiaptts_tpu.ops.world.f0 import extract_f0  # noqa: F401
from idiaptts_tpu.ops.world.cheaptrick import cheaptrick  # noqa: F401
from idiaptts_tpu.ops.world.d4c import d4c_band_aperiodicity  # noqa: F401
from idiaptts_tpu.ops.world.synthesis import world_synthesis  # noqa: F401
