"""Trace-time context and shared gating for the Pallas fast paths.

The Pallas kernels have no GSPMD partitioning rule, so by default they
only engage when the process sees exactly one device.  Inside a
``shard_map``, however, the traced program IS single-device — each
shard runs its own copy — which `jax.device_count()` cannot see.  The
sharded serving pipeline wraps its (lazy) jit invocation in
:func:`force_single_device` so the kernel gates treat the trace as
single-device and the per-chip programs get the fused kernels.

The flag is thread-local: tracing can happen concurrently (the serving
server is multi-threaded), and a force in one thread must not leak
into another thread's trace of a GSPMD-sharded program.
"""

import threading
from contextlib import contextmanager

_STATE = threading.local()


@contextmanager
def force_single_device():
    """Mark the enclosed (tracing) region as per-device code."""
    prev = getattr(_STATE, "forced", False)
    _STATE.forced = True
    try:
        yield
    finally:
        _STATE.forced = prev


def forced_single_device():
    return getattr(_STATE, "forced", False)


@contextmanager
def force_interpret():
    """Run every Pallas kernel in interpret mode inside the enclosed
    (tracing) region — lets CPU tests and the multi-chip dryrun execute
    the REAL kernel code paths (forward and backward) where the
    hardware gate would otherwise fall back to the scan.  Test/dryrun
    only; never enabled in production paths."""
    prev = getattr(_STATE, "interpret", False)
    _STATE.interpret = True
    try:
        yield
    finally:
        _STATE.interpret = prev


def interpret_forced():
    return getattr(_STATE, "interpret", False)


@contextmanager
def train_profile(bf16_residuals=True):
    """Mark the enclosed (tracing) region as a TRAINING-step trace.

    Two trace-time effects on the fused BiLSTM kernels
    (ops/pallas_lstm.py):

    - dispatch uses the TRAIN viability gates (``train_viable`` /
      ``layer_train_viable``) instead of the inference ones: training
      keeps the kernels up to a full 128-row MXU tile (B=64) because
      the alternative — the XLA scan's VJP — saves ~T*B*5F float32
      residuals per layer and goes HBM-bound there, while the
      inference-only gates hand large batches to the scan (where it
      genuinely wins);
    - with ``bf16_residuals`` (default) the train-mode forward streams
      its backward residuals (post-activation gates, cell states, and
      the upstream cotangent) in bfloat16 — halving both the VMEM
      working set and the HBM residual traffic at ~bf16 rounding cost
      on the gradients (the sequential dh/dc carries stay float32).

    Inference dispatch is unaffected: traces outside this context
    (serving, trainer.synth) never pay the residual streams anyway
    (custom_vjp only runs the train-mode forward under
    differentiation).
    """
    prev = getattr(_STATE, "train", None)
    _STATE.train = {"bf16_residuals": bool(bf16_residuals)}
    try:
        yield
    finally:
        _STATE.train = prev


def train_profile_active():
    return getattr(_STATE, "train", None) is not None


def train_residuals_bf16():
    t = getattr(_STATE, "train", None)
    return bool(t and t["bf16_residuals"])


def fast_path_allowed():
    """The shared gate for every Pallas fast path: a real (non-CPU)
    backend AND a single-device trace — either literally, or marked so
    by :func:`force_single_device` (shard_map per-device bodies).
    :func:`force_interpret` lifts the backend requirement (the kernels
    then run emulated).  Per-kernel shape viability checks stack on
    top of this."""
    import jax

    return ((jax.default_backend() not in ("cpu",) or interpret_forced())
            and (jax.device_count() == 1 or forced_single_device()))
