"""Trace-time context for the Pallas fast paths.

The Pallas kernels have no GSPMD partitioning rule, so by default they
only engage when the process sees exactly one device.  Inside a
``shard_map``, however, the traced program IS single-device — each
shard runs its own copy — which `jax.device_count()` cannot see.  The
sharded serving pipeline wraps its (lazy) jit invocation in
:func:`force_single_device` so the kernel gates treat the trace as
single-device and the per-chip programs get the fused kernels.
"""

from contextlib import contextmanager

_FORCED = [False]


@contextmanager
def force_single_device():
    """Mark the enclosed (tracing) region as per-device code."""
    prev = _FORCED[0]
    _FORCED[0] = True
    try:
        yield
    finally:
        _FORCED[0] = prev


def forced_single_device():
    return _FORCED[0]
