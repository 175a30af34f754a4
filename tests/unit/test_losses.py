"""NamedLoss reduction semantics pinned against the reference formulas.

The reference ``NamedLoss._reduce`` (loss/NamedLoss.py:113-131) computes
mean_per_frame = (per-elem loss summed over batch+time / total valid
frames) averaged over the feature dim, and mean_per_sample = (summed
over time / per-sample length) averaged over batch and features.  These
were wrong by a factor of feature_dim in round 1 (advisor finding).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from idiaptts_tpu.models.losses import NamedLoss


def _data(B=3, T=5, D=4, lengths=(5, 3, 4), seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.randn(B, T, D).astype(np.float32)
    target = rng.randn(B, T, D).astype(np.float32)
    mask = np.zeros((B, T, 1), np.float32)
    for b, ln in enumerate(lengths):
        mask[b, :ln] = 1.0
    return {"pred": pred, "target": target, "mask": mask}, \
        np.asarray(lengths)


def _loss(reduction, seq_mask="mask", **kw):
    cfg = NamedLoss.Config("l", "MSELoss", ("pred", "target"),
                           seq_mask=seq_mask, reduction=reduction, **kw)
    return cfg.create_loss()


def test_mean_per_frame_matches_reference_formula():
    data, lengths = _data()
    got = float(_loss("mean_per_frame")(data))
    err = (data["pred"] - data["target"]) ** 2 * data["mask"]
    # Reference: v.sum(dim=(0,1)) / total_frames, then .mean() over feats.
    want = (err.sum(axis=(0, 1)) / lengths.sum()).mean()
    assert got == pytest.approx(float(want), rel=1e-5)


def test_mean_per_frame_not_inflated_by_feature_dim():
    # A constant error of 1 everywhere must reduce to ~1, not feat_dim.
    B, T, D = 2, 4, 67
    data = {"pred": np.ones((B, T, D), np.float32),
            "target": np.zeros((B, T, D), np.float32),
            "mask": np.ones((B, T, 1), np.float32)}
    got = float(_loss("mean_per_frame")(data))
    assert got == pytest.approx(1.0, rel=1e-5)


def test_mean_per_sample_matches_reference_formula():
    data, lengths = _data()
    got = float(_loss("mean_per_sample")(data))
    err = (data["pred"] - data["target"]) ** 2 * data["mask"]
    # Reference: v.sum(dim=time) / length per sample, then mean over
    # batch and features.
    want = (err.sum(axis=1) / lengths[:, None]).mean()
    assert got == pytest.approx(float(want), rel=1e-5)


def test_masked_reductions_fall_back_to_mean_without_seq_mask():
    data, _ = _data()
    err = (data["pred"] - data["target"]) ** 2
    for red in ("mean_per_frame", "mean_per_sample"):
        got = float(_loss(red, seq_mask=None)(data))
        assert got == pytest.approx(float(err.mean()), rel=1e-5)


def test_mean_sum_none():
    data, _ = _data()
    err = (data["pred"] - data["target"]) ** 2 * data["mask"]
    assert float(_loss("sum")(data)) == pytest.approx(
        float(err.sum()), rel=1e-5)
    # Masked mean: sum / count of valid elements (mask broadcast to
    # feature dim).
    n_valid = data["mask"].sum() * data["pred"].shape[-1]
    assert float(_loss("mean")(data)) == pytest.approx(
        float(err.sum() / n_valid), rel=1e-5)
    out = _loss("none")(data)
    assert out.shape == data["pred"].shape


def test_start_step_and_weight():
    data, _ = _data()
    loss = _loss("mean_per_frame", loss_weight=2.0, start_step=10)
    assert float(loss(data, step=5)) == 0.0
    base = float(_loss("mean_per_frame")(data, step=20))
    assert float(loss(data, step=20)) == pytest.approx(2 * base, rel=1e-5)


def test_multi_loss_balance_is_dimension_free():
    """A 1-dim VUV loss and a 67-dim acoustic loss with equal per-element
    error now contribute equally (the round-1 bug skewed this 67x)."""
    B, T = 2, 6
    mask = np.ones((B, T, 1), np.float32)
    d = {"a_pred": np.ones((B, T, 67), np.float32),
         "a_tgt": np.zeros((B, T, 67), np.float32),
         "v_pred": np.ones((B, T, 1), np.float32),
         "v_tgt": np.zeros((B, T, 1), np.float32),
         "mask": mask}
    la = NamedLoss.Config("a", "MSELoss", ("a_pred", "a_tgt"),
                          seq_mask="mask").create_loss()
    lv = NamedLoss.Config("v", "MSELoss", ("v_pred", "v_tgt"),
                          seq_mask="mask").create_loss()
    assert float(la(d)) == pytest.approx(float(lv(d)), rel=1e-6)
