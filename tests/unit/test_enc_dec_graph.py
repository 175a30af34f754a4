"""Config-composed encoder/decoder graphs + attention decoder tests
(reference test_EncDecDyn.py:19-700 coverage class: process-group
composition, teacher-forced vs free-running decoder parity, inference
without targets, n_frames_per_step, save/load round trip; plus the
dot-product attention path the reference left as an empty stub)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idiaptts_tpu.models import rnn_dyn
from idiaptts_tpu.models.config import ModelConfig
from idiaptts_tpu.models.enc_dec import AttentionDecoder, EncDecGraph

B, P, T, OUT = 2, 7, 12, 5


def _encoder_cfg():
    return EncDecGraph.ModuleConfig(
        name="Encoder",
        config=rnn_dyn.Config(layer_configs=[
            rnn_dyn.LayerConfig(layer_type="Linear", out_dim=8,
                                nonlin="ReLU")]),
        input_names=["phonemes"],
        output_names=["phoneme_embeddings"],
        process_group=0)


def _decoder_cfg(n_frames_per_step=2, p_teacher_forcing=1.0):
    return AttentionDecoder.Config(
        name="Decoder", attention_type="fixed",
        input_names=["phoneme_embeddings"],
        teacher_forcing_input_names=["acoustic_features"],
        prenet_dims=(6,), lstm_dims=(16, 8),
        projections=[("pred_intermediate", OUT, (), True)],
        decoder_output_name="decoder_hidden",
        n_frames_per_step=n_frames_per_step,
        p_teacher_forcing=p_teacher_forcing, process_group=1)


def _postnet_cfg():
    return EncDecGraph.ModuleConfig(
        name="Postnet",
        config=rnn_dyn.Config(layer_configs=[
            rnn_dyn.LayerConfig(layer_type="Linear", out_dim=OUT)]),
        input_names=["pred_intermediate"],
        output_names=["pred_acoustic_features"],
        process_group=2)


def _data(seed=0):
    rng = np.random.RandomState(seed)
    attn = np.zeros((B, T, P), np.float32)
    for b in range(B):
        for t in range(T):
            attn[b, t, min(t // 2, P - 1)] = 1.0
    return {
        "phonemes": jnp.asarray(rng.randn(B, P, 3), jnp.float32),
        "attention_matrix": jnp.asarray(attn),
        "acoustic_features": jnp.asarray(rng.randn(B, T, OUT),
                                         jnp.float32),
    }


@pytest.fixture(scope="module")
def graph():
    cfg = EncDecGraph.Config(
        modules=[_encoder_cfg(), _decoder_cfg(), _postnet_cfg()])
    model = cfg.create_model()
    params = model.init(jax.random.PRNGKey(0), _data(), training=True)
    return cfg, model, params


def test_process_group_composition(graph):
    cfg, model, params = graph
    out = model.apply(params, _data(), training=True)
    assert out["pred_acoustic_features"].shape == (B, T, OUT)
    assert out["pred_intermediate"].shape == (B, T, OUT)
    # decoder hidden is chunk-rate (n_frames_per_step=2) with the last
    # LSTM layer's width.
    assert out["decoder_hidden"].shape == (B, T // 2, 8)
    assert np.isfinite(np.asarray(out["pred_acoustic_features"])).all()
    # module_config lookup (reference Config.__getattr__ role)
    assert cfg.module_config("Decoder").name == "Decoder"
    with pytest.raises(AttributeError):
        cfg.module_config("nope")


def test_inference_without_target(graph):
    """Free-running decode with fixed attention needs no acoustic
    target (reference test_fixed_attention_auto_regressive_inference)."""
    _, model, params = graph
    data = {k: v for k, v in _data().items()
            if k != "acoustic_features"}
    out = model.apply(params, data, training=False)
    assert out["pred_acoustic_features"].shape == (B, T, OUT)
    assert np.isfinite(np.asarray(out["pred_acoustic_features"])).all()


def test_teacher_forced_equals_free_running_on_own_outputs(graph):
    """Decoder-equivalence: feeding the model's own free-running output
    back as the teacher target must reproduce the free-running output
    exactly — the TF selector and the AR feedback follow the same path
    (reference batched-vs-iterative parity,
    test_fixed_attention_batched vs _auto_regressive)."""
    _, model, params = graph
    data = _data()
    free = model.apply(params, {k: v for k, v in data.items()
                                if k != "acoustic_features"},
                       training=False)
    teacher = dict(data)
    teacher["acoustic_features"] = free["pred_intermediate"]
    forced = model.apply(params, teacher, training=True)
    np.testing.assert_allclose(np.asarray(forced["pred_intermediate"]),
                               np.asarray(free["pred_intermediate"]),
                               rtol=1e-5, atol=1e-5)


def test_partial_teacher_forcing_runs():
    cfg = EncDecGraph.Config(
        modules=[_encoder_cfg(),
                 _decoder_cfg(p_teacher_forcing=0.5)])
    model = cfg.create_model()
    data = _data()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "teacher": jax.random.PRNGKey(1)},
                        data, training=True)
    out = model.apply(params, data, training=True,
                      rngs={"teacher": jax.random.PRNGKey(2)})
    assert out["pred_intermediate"].shape == (B, T, OUT)


def test_dot_product_attention_decoder():
    """Content-based attention: masked softmax weights over the
    encoder memory, exported under the attention output name."""
    dec = AttentionDecoder.Config(
        name="Dec", attention_type="dot_product", attention_dim=8,
        input_names=["phoneme_embeddings"],
        teacher_forcing_input_names=["acoustic_features"],
        prenet_dims=(6,), lstm_dims=(16,),
        projections=[("pred2", OUT, (4,), True)],
        n_frames_per_step=1, max_decoder_steps=9, process_group=1)
    cfg = EncDecGraph.Config(modules=[_encoder_cfg(), dec])
    model = cfg.create_model()
    data = _data()
    lengths = {"phonemes": jnp.array([P, P - 2])}
    params = model.init(jax.random.PRNGKey(1), data, lengths=lengths,
                        training=True)
    out = model.apply(params, data, lengths=lengths, training=True)
    assert out["pred2"].shape == (B, T, OUT)
    attn = np.asarray(out["attention"])
    assert attn.shape == (B, T, P)
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
    # Padded memory positions receive (numerically) zero weight.
    assert (attn[1, :, P - 2:] < 1e-6).all()
    # Free-running without target decodes max_decoder_steps frames.
    free = model.apply(params, {"phonemes": data["phonemes"]},
                       lengths=lengths, training=False)
    assert free["pred2"].shape == (B, 9, OUT)


def test_config_json_round_trip(graph):
    """Composed graph config (incl. decoder + projections) survives the
    checkpoint JSON encoding and rebuilds an identical model
    (reference test_save_load role)."""
    cfg, model, params = graph
    rebuilt = ModelConfig.from_json(cfg.to_json()).create_model()
    data = _data()
    np.testing.assert_allclose(
        np.asarray(rebuilt.apply(params, data, training=True)
                   ["pred_acoustic_features"]),
        np.asarray(model.apply(params, data, training=True)
                   ["pred_acoustic_features"]), rtol=1e-6)


def test_graph_trains():
    import optax
    cfg = EncDecGraph.Config(
        modules=[_encoder_cfg(), _decoder_cfg(), _postnet_cfg()])
    model = cfg.create_model()
    data = _data()
    target = data["acoustic_features"]
    params = model.init(jax.random.PRNGKey(0), data, training=True)

    def loss_fn(p):
        out = model.apply(p, data, training=True)
        return jnp.mean((out["pred_acoustic_features"] - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(15):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < l0
