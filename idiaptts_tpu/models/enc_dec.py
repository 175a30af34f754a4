"""Encoder-decoder models with attention (autoregressive decoding).

Capability parity with the reference's ``enc_dec_dyn`` family
(``models/enc_dec_dyn/`` — config-composed encoder/decoder graph,
``DecoderModule`` batched teacher-forced vs frame-iterative
autoregressive decoding ``DecoderModule.py:82-329``, attention base +
``FixedAttention`` (duration matrix :12-47) + ``DotProductAttention``)
— the reference's own batched path is mid-refactor/stubbed, so this is
a clean implementation of the documented behaviour.

TPU-native design: the decoder is one lifted ``nn.scan`` over frame
chunks for BOTH teacher-forced and free-running modes (a per-step
selector in the carry chooses the next input), so training and
inference share parameters and compile to the same scan.  Fixed
attention is a single (T, P) batched matmul over encoder outputs.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idiaptts_tpu.models.config import ModelConfig


class FixedAttention(nn.Module):
    """Duration-derived hard attention: context = A @ encoder_out
    (FixedAttention.py:12-47 role)."""

    def __call__(self, attention_matrix, encoder_out):
        return jnp.einsum("btp,bpe->bte", attention_matrix, encoder_out)


class DotProductAttention(nn.Module):
    """Scaled dot-product attention with learned projections."""

    attention_dim: int = 128

    @nn.compact
    def __call__(self, queries, keys, values, key_lengths=None):
        q = nn.Dense(self.attention_dim, name="query")(queries)
        k = nn.Dense(self.attention_dim, name="key")(keys)
        scores = jnp.einsum("btd,bpd->btp", q, k) \
            / np.sqrt(self.attention_dim)
        if key_lengths is not None:
            mask = (jnp.arange(keys.shape[1])[None, None, :]
                    < key_lengths[:, None, None])
            scores = jnp.where(mask, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("btp,bpe->bte", weights, values), weights


class _DecoderStep(nn.Module):
    """One autoregressive decoder step: prenet(prev) + context ->
    LSTM -> frames + gate.  Scanned over chunks with nn.scan."""

    prenet_dim: int
    decoder_dim: int
    frame_out: int

    @nn.compact
    def __call__(self, carry, inputs):
        lstm_carry, prev_frames = carry
        ctx_flat, tgt_flat, use_tf = inputs
        pre = nn.relu(nn.Dense(self.prenet_dim, name="prenet")(
            prev_frames))
        lstm_in = jnp.concatenate([pre, ctx_flat], axis=-1)
        cell = nn.OptimizedLSTMCell(self.decoder_dim, name="cell")
        lstm_carry, h = cell(lstm_carry, lstm_in)
        frames = nn.Dense(self.frame_out, name="proj")(h)
        gate = nn.Dense(1, name="gate")(h)
        next_prev = jnp.where(use_tf, tgt_flat, frames)
        return (lstm_carry, next_prev), (frames, gate)


class EncDecDyn(nn.Module):
    """Encoder + fixed attention + autoregressive decoder + EOF gate."""

    config: "EncDecDyn.Config"

    @nn.compact
    def __call__(self, data_dict, lengths=None, training=False):
        cfg = self.config
        phones = jnp.asarray(data_dict[cfg.input_names[0]])
        x = phones
        for i, units in enumerate(cfg.encoder_units):
            x = nn.relu(nn.Dense(units, name="encoder_{}".format(i))(x))
        enc_out = x

        if cfg.attention_type == "fixed":
            attn = jnp.asarray(data_dict[cfg.attention_name])
            # Align the phone axis with the (bucket-padded) encoder
            # output: padded phones receive zero attention.
            P_enc = enc_out.shape[1]
            if attn.shape[-1] < P_enc:
                attn = jnp.pad(attn, ((0, 0), (0, 0),
                                      (0, P_enc - attn.shape[-1])))
            elif attn.shape[-1] > P_enc:
                attn = attn[..., :P_enc]
            context = FixedAttention()(attn, enc_out)
        else:
            raise NotImplementedError(cfg.attention_type)

        B, T, E = context.shape
        out_dim = cfg.out_dim
        n_step = cfg.n_frames_per_step
        num_chunks = max(1, T // n_step)
        context_c = context[:, :num_chunks * n_step].reshape(
            B, num_chunks, n_step * E)

        teacher = training and cfg.target_name in data_dict
        if cfg.target_name in data_dict:
            tgt = jnp.asarray(data_dict[cfg.target_name])
            tgt = tgt[:, :num_chunks * n_step, :out_dim]
            tgt_c = tgt.reshape(B, num_chunks, n_step * out_dim)
            shifted = jnp.concatenate(
                [jnp.zeros((B, 1, n_step * out_dim)), tgt_c[:, :-1]],
                axis=1)
        else:
            shifted = jnp.zeros((B, num_chunks, n_step * out_dim))
        use_tf = jnp.full((B, num_chunks, 1),
                          1.0 if teacher else 0.0)

        scan = nn.scan(_DecoderStep,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        step = scan(prenet_dim=cfg.prenet_dim,
                    decoder_dim=cfg.decoder_dim,
                    frame_out=n_step * out_dim, name="decoder")
        cell_proto = nn.OptimizedLSTMCell(cfg.decoder_dim)
        lstm_carry = cell_proto.initialize_carry(
            jax.random.PRNGKey(0),
            (B, cfg.prenet_dim + n_step * E))
        prev0 = jnp.zeros((B, n_step * out_dim))
        _, (frames, gates) = step((lstm_carry, prev0),
                                  (context_c, shifted, use_tf))

        frames = frames.reshape(B, num_chunks * n_step, out_dim)
        gates = jnp.repeat(gates, n_step, axis=1)
        out = dict(data_dict)
        out[cfg.output_names[0]] = frames
        gate_name = cfg.output_names[1] if len(cfg.output_names) > 1 \
            else "pred_gate"
        out[gate_name] = jax.nn.sigmoid(gates)
        return out

    class Config(ModelConfig):
        def __init__(self, encoder_units=(256,), out_dim=None,
                     prenet_dim=128, decoder_dim=512,
                     n_frames_per_step=2, attention_type="fixed",
                     attention_name="attention_matrix",
                     target_name="acoustic_features", **kwargs):
            super().__init__(**kwargs)
            self.encoder_units = tuple(encoder_units)
            self.out_dim = out_dim
            self.prenet_dim = prenet_dim
            self.decoder_dim = decoder_dim
            self.n_frames_per_step = n_frames_per_step
            self.attention_type = attention_type
            self.attention_name = attention_name
            self.target_name = target_name

        def create_model(self):
            return EncDecDyn(config=self)
