"""Merge-type semantics of the named-module protocol
(reference NamedForwardModule.py:116-137: cat/add/mean/mul/attention/list)."""

import numpy as np
import jax.numpy as jnp

from idiaptts_tpu.models.config import ModelConfig
from idiaptts_tpu.models.named import merge_inputs


def _data():
    rng = np.random.RandomState(0)
    return {"a": jnp.asarray(rng.randn(2, 5, 3).astype(np.float32)),
            "b": jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))}


def test_merge_cat_add_mean_mul():
    d = _data()
    a, b = np.asarray(d["a"]), np.asarray(d["b"])
    cat = merge_inputs(d, ["a", "b"], ModelConfig.MERGE_CAT)
    assert cat.shape == (2, 5, 6)
    np.testing.assert_allclose(
        merge_inputs(d, ["a", "b"], ModelConfig.MERGE_ADD), a + b, rtol=1e-6)
    np.testing.assert_allclose(
        merge_inputs(d, ["a", "b"], ModelConfig.MERGE_MEAN), (a + b) / 2,
        rtol=1e-6)
    np.testing.assert_allclose(
        merge_inputs(d, ["a", "b"], ModelConfig.MERGE_MUL), a * b, rtol=1e-6)


def test_merge_attention_pools_time():
    """attention = elementwise product then sum over time, time dim kept
    (NamedForwardModule.py:127-130)."""
    d = _data()
    a, b = np.asarray(d["a"]), np.asarray(d["b"])
    out = merge_inputs(d, ["a", "b"], ModelConfig.MERGE_ATTENTION)
    assert out.shape == (2, 1, 3)
    np.testing.assert_allclose(out, (a * b).sum(axis=1, keepdims=True),
                               rtol=1e-5)


def test_merge_list_returns_parts():
    d = _data()
    out = merge_inputs(d, ["a", "b"], ModelConfig.MERGE_LIST)
    assert isinstance(out, list) and len(out) == 2


def test_merge_broadcasts_time_dim():
    d = {"seq": jnp.ones((2, 5, 3)), "emb": jnp.full((2, 4), 2.0)}
    out = merge_inputs(d, ["seq", "emb"], ModelConfig.MERGE_CAT)
    assert out.shape == (2, 5, 7)
    assert np.all(np.asarray(out)[..., 3:] == 2.0)
