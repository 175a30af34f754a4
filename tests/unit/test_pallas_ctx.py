"""The trace-time single-device override for the Pallas kernel gates."""

import jax

from idiaptts_tpu.ops import pallas_ctx


def test_flag_scoping_and_nesting():
    assert not pallas_ctx.forced_single_device()
    with pallas_ctx.force_single_device():
        assert pallas_ctx.forced_single_device()
        with pallas_ctx.force_single_device():
            assert pallas_ctx.forced_single_device()
        assert pallas_ctx.forced_single_device()
    assert not pallas_ctx.forced_single_device()


def test_flag_restored_on_error():
    try:
        with pallas_ctx.force_single_device():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not pallas_ctx.forced_single_device()


import pytest


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="asserts the CPU-backend refusal")
def test_gates_still_refuse_cpu_backend():
    """The override marks a trace as per-device; it must NOT enable the
    kernels on the CPU backend (interpret mode is for parity tests)."""
    from idiaptts_tpu.ops.pallas_lstm import use_pallas_recurrence
    from idiaptts_tpu.ops.pallas_wavenet import use_pallas_sampler

    with pallas_ctx.force_single_device():
        assert not use_pallas_recurrence()
        assert not use_pallas_sampler()
