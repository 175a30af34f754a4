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


def _layer_inputs(Bp=8, T=12, D=128, F=128, seed=4):
    rs = np.random.RandomState(seed)
    xin = jnp.asarray(
        rs.randn(T, 2 * Bp, D).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    wx = jnp.asarray(rs.randn(2, D, 4 * F).astype(np.float32) * 0.05)
    wh_cat = jnp.asarray(
        rs.randn(2 * F, 4 * F).astype(np.float32) * 0.02)
    b = jnp.asarray(rs.randn(2, 4 * F).astype(np.float32) * 0.1)
    return xin, wx, wh_cat, b


def test_train_mode_forward_matches_inference_kernel():
    """The residual-saving forward kernels return bit-identical hidden
    states to the inference kernels, and the saved gates/cells satisfy
    the LSTM state equations."""
    from idiaptts_tpu.ops import pallas_lstm

    xin, wx, wh_cat, b = _layer_inputs(T=19)
    h_inf = pallas_lstm._layer_tmajor(xin, wx, wh_cat, b,
                                      interpret=True)
    h, a, c = pallas_lstm._layer_train_tmajor(xin, wx, wh_cat, b,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_inf))
    F = 128
    a, c, h = map(np.asarray, (a, c, h))
    i, f, g, o = (a[..., k * F:(k + 1) * F] for k in range(4))
    cprev = np.concatenate([np.zeros_like(c[:1]), c[:-1]])
    np.testing.assert_allclose(f * cprev + i * g, c, atol=1e-6)
    np.testing.assert_allclose(o * np.tanh(c), h, atol=1e-6)


def test_fused_layer_backward_matches_scan_gradients():
    """jax.grad through bilstm_layer_tmajor (train-mode Pallas forward
    + reverse-time Pallas backward, interpret mode) equals the scan
    path's gradients.  Tolerances are bf16-matmul rounding: dz rides
    the MXU in bf16 for dWh/dWx/dx, and the scan VJP rounds dh through
    bf16 per step where the kernel carries f32."""
    from idiaptts_tpu.ops import pallas_lstm
    from idiaptts_tpu.ops import pallas_ctx

    xin, wx, wh_cat, b = _layer_inputs()

    def loss_scan(*args):
        return jnp.sum(pallas_lstm._scan_layer_tmajor(*args) ** 2)

    def loss_fused(*args):
        return jnp.sum(pallas_lstm.bilstm_layer_tmajor(*args) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xin, wx, wh_cat,
                                                      b)
    with pallas_ctx.force_interpret():
        g = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xin, wx, wh_cat,
                                                       b)
    for got, ref in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-3)


def test_fused_recurrence_backward_matches_scan_gradients():
    """jax.grad through bilstm_recurrence_tmajor with the fused
    backward kernel equals the scan gradients (bf16-rounding scale)."""
    from idiaptts_tpu.ops import pallas_lstm
    from idiaptts_tpu.ops import pallas_ctx

    Bp, T, F = 8, 16, 128
    rs = np.random.RandomState(1)
    xp_t = jnp.asarray(
        rs.randn(T, 2 * Bp, 4 * F).astype(np.float32) * 0.1)
    wh_cat = jnp.asarray(
        rs.randn(2 * F, 4 * F).astype(np.float32) * 0.02)

    def loss_scan(xp, w):
        return jnp.sum(pallas_lstm._scan_tmajor(xp, w) ** 2)

    def loss_fused(xp, w):
        return jnp.sum(pallas_lstm.bilstm_recurrence_tmajor(xp, w) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(xp_t, wh_cat)
    with pallas_ctx.force_interpret():
        g_x, g_w = jax.grad(loss_fused, argnums=(0, 1))(xp_t, wh_cat)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref[0]),
                               rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_ref[1]),
                               rtol=2e-2, atol=2e-3)


def test_bf16_residual_streams_gradients_close_to_f32():
    """Under ``pallas_ctx.train_profile`` the train-mode forward
    streams its backward residuals in bfloat16.  The hidden states
    stay bit-identical (carries are f32; only the streamed copies
    round), and the gradients stay within bf16-rounding distance of
    the f32-residual fused path."""
    from idiaptts_tpu.ops import pallas_ctx, pallas_lstm

    xin, wx, wh_cat, b = _layer_inputs(T=19)

    def loss(*args):
        return jnp.sum(pallas_lstm.bilstm_layer_tmajor(*args) ** 2)

    with pallas_ctx.force_interpret():
        h32, a32, _ = pallas_lstm._layer_train_tmajor(
            xin, wx, wh_cat, b, interpret=True)
        h16, a16, c16 = pallas_lstm._layer_train_tmajor(
            xin, wx, wh_cat, b, res_bf16=True, interpret=True)
        g32 = jax.grad(loss, argnums=(0, 1, 2, 3))(xin, wx, wh_cat, b)
        with pallas_ctx.train_profile(bf16_residuals=True):
            g16 = jax.grad(loss, argnums=(0, 1, 2, 3))(xin, wx,
                                                       wh_cat, b)
    assert a32.dtype == jnp.float32 and a16.dtype == jnp.bfloat16
    assert c16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(h16), np.asarray(h32))
    # Worst case measured at this shape: ~1.3e-2 absolute on dWx
    # (errors of the rounded gate residuals correlate across the
    # T*R-term weight-gradient reduction); everything else is at
    # bf16-rounding scale.  Training-level acceptability is pinned by
    # the Adam trajectory test in test_shard_map_training.py.
    for got, ref in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=5e-2, atol=2e-2)


def test_train_profile_viability_gates():
    """The train gates keep the kernels live at batches the inference
    gates hand to the scan (B=64 is one full 128-row MXU tile) and cap
    out beyond that."""
    from idiaptts_tpu.ops import pallas_ctx, pallas_lstm

    F = 512
    assert not pallas_lstm.pallas_viable(64, F)
    with pallas_ctx.train_profile(bf16_residuals=True):
        assert pallas_lstm.train_viable(32, F)
        assert pallas_lstm.train_viable(64, F)
        assert not pallas_lstm.train_viable(96, F)


def test_backward_falls_back_to_scan_vjp_when_not_viable(monkeypatch):
    """When the backward working set cannot fit VMEM the custom_vjp
    silently uses the scan VJP (forward-recompute) — gradients equal
    the scan path exactly."""
    from idiaptts_tpu.ops import pallas_lstm
    from idiaptts_tpu.ops import pallas_ctx

    monkeypatch.setattr(pallas_lstm, "_pick_bwd_time_block",
                        lambda *a, **k: 0)
    xin, wx, wh_cat, b = _layer_inputs()

    def loss_scan(*args):
        return jnp.sum(pallas_lstm._scan_layer_tmajor(*args) ** 2)

    def loss_fused(*args):
        return jnp.sum(pallas_lstm.bilstm_layer_tmajor(*args) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xin, wx, wh_cat,
                                                      b)
    with pallas_ctx.force_interpret():
        g = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xin, wx, wh_cat,
                                                       b)
    for got, ref in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-4)
