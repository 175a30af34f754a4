"""Parity tests for the fused Pallas BiLSTM recurrence kernel.

On CPU the kernel runs in interpret mode; on a real TPU the identical
kernel was additionally measured bit-exact vs the scan at the headline
benchmark shape (B=9, T=2048, F=512).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idiaptts_tpu.ops.pallas_lstm import (
    _HAS_PALLAS, bilstm_recurrence_pallas, bilstm_recurrence_scan)

pytestmark = [
    pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable"),
    # Interpret mode is the CPU-testing vehicle: under other backends
    # its lowering (and bit-exact tolerances) differ; the compiled
    # kernels are covered on hardware by the model-level integration
    # tests and the reference-parity benchmark.
    pytest.mark.skipif(jax.default_backend() != "cpu",
                       reason="interpret-mode parity is CPU-only"),
]


def _rand_inputs(B, T, F, seed=0):
    rs = np.random.RandomState(seed)
    x_proj = jnp.asarray(
        rs.randn(2, B, T, 4 * F).astype(np.float32) * 0.1)
    wh = jnp.asarray(rs.randn(2, F, 4 * F).astype(np.float32) * 0.02)
    return x_proj, wh


@pytest.mark.parametrize("B,T,F", [
    (3, 37, 128),     # unaligned batch + time
    (1, 8, 256),      # minimal batch, one time block
    (9, 96, 128),     # benchmark-batch rows, several blocks
])
def test_pallas_recurrence_matches_scan(B, T, F):
    x_proj, wh = _rand_inputs(B, T, F)
    out_scan = bilstm_recurrence_scan(x_proj, wh)
    out_pallas = bilstm_recurrence_pallas(x_proj, wh, interpret=True)
    assert out_pallas.shape == (2, B, T, F)
    np.testing.assert_allclose(np.asarray(out_pallas),
                               np.asarray(out_scan),
                               rtol=0, atol=1e-6)


def test_recurrence_state_carries_across_time_blocks():
    """A constant input must drive the usual LSTM saturation curve —
    detects a carry reset at time-block boundaries (TB=8)."""
    B, T, F = 2, 40, 128
    x_proj = jnp.ones((2, B, T, 4 * F), jnp.float32) * 0.5
    wh = jnp.zeros((2, F, 4 * F), jnp.float32)
    out = bilstm_recurrence_pallas(x_proj, wh, interpret=True)
    out = np.asarray(out)
    # With zero recurrent weights the cell integrates a constant:
    # strictly increasing h across every block boundary.
    assert np.all(np.diff(out[0, 0, :, 0]) > 0)


@pytest.mark.parametrize("B,T,D,F", [
    (2, 19, 96, 128),     # unaligned time + input dim
    (8, 16, 256, 128),    # aligned
])
def test_fused_layer_matches_scan(B, T, D, F):
    """Projection-fused layer kernel vs the scan-equivalent layer."""
    from idiaptts_tpu.ops import pallas_lstm

    rs = np.random.RandomState(3)
    Bp = -(-B // 8) * 8
    xin = jnp.asarray(
        rs.randn(T, 2 * Bp, D).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    wx = jnp.asarray(rs.randn(2, D, 4 * F).astype(np.float32) * 0.05)
    wh_cat = jnp.asarray(
        rs.randn(2 * F, 4 * F).astype(np.float32) * 0.02)
    b = jnp.asarray(rs.randn(2, 4 * F).astype(np.float32) * 0.1)
    out_k = pallas_lstm._layer_tmajor(xin, wx, wh_cat, b,
                                      interpret=True)
    out_s = pallas_lstm._scan_layer_tmajor(xin, wx, wh_cat, b)
    assert out_k.shape == (T, 2 * Bp, F)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_s),
                               rtol=0, atol=2e-6)


def test_fused_layer_vjp_matches_scan_gradients():
    from idiaptts_tpu.ops import pallas_lstm

    Bp, T, D, F = 8, 12, 128, 128
    rs = np.random.RandomState(4)
    xin = jnp.asarray(
        rs.randn(T, 2 * Bp, D).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    wx = jnp.asarray(rs.randn(2, D, 4 * F).astype(np.float32) * 0.05)
    wh_cat = jnp.asarray(
        rs.randn(2 * F, 4 * F).astype(np.float32) * 0.02)
    b = jnp.asarray(rs.randn(2, 4 * F).astype(np.float32) * 0.1)

    def loss_scan(*args):
        return jnp.sum(pallas_lstm._scan_layer_tmajor(*args) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xin, wx, wh_cat,
                                                      b)
    g = pallas_lstm._layer_bwd(
        (xin, wx, wh_cat, b),
        2.0 * pallas_lstm._scan_layer_tmajor(xin, wx, wh_cat, b))
    for got, ref in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_scan_gradients():
    """bilstm_recurrence_tmajor's backward is the scan VJP: compare
    against jax.grad of the equivalent scan directly."""
    from idiaptts_tpu.ops import pallas_lstm

    Bp, T, F = 8, 16, 128
    rs = np.random.RandomState(1)
    xp_t = jnp.asarray(
        rs.randn(T, 2 * Bp, 4 * F).astype(np.float32) * 0.1)
    wh_cat = jnp.asarray(
        rs.randn(2 * F, 4 * F).astype(np.float32) * 0.02)

    def loss_scan(xp, w):
        return jnp.sum(pallas_lstm._scan_tmajor(xp, w) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(xp_t, wh_cat)
    g_x, g_w = pallas_lstm._bilstm_bwd(
        (xp_t, wh_cat), 2.0 * pallas_lstm._scan_tmajor(xp_t, wh_cat))
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-5)
