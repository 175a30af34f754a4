"""Model wrappers for long sequences.

Capability parity with ``models/WindowingWrapper.py`` (:23-310): run a
wrapped model on overlapping windows of a long sequence and merge the
outputs (linear cross-fade in the overlaps) — the single-process
long-sequence strategy of the reference (SURVEY.md §2.8/§5).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from idiaptts_tpu.models.config import ModelConfig
from idiaptts_tpu.models.named import merge_inputs, write_outputs


class WindowingWrapper(nn.Module):
    """Applies the wrapped module to overlapping windows and merges."""

    wrapped: nn.Module
    input_names: tuple
    output_names: tuple
    window_size: int
    window_step: int

    @nn.compact
    def __call__(self, data_dict, lengths=None, training=False):
        from idiaptts_tpu.models.named import select_lengths
        lengths = select_lengths(lengths, *self.input_names)
        x = merge_inputs(data_dict, self.input_names)
        B, T, D = x.shape
        W, S = self.window_size, self.window_step
        if T <= W:
            out = self.wrapped({self.input_names[0]: x},
                               lengths=lengths, training=training)
            return write_outputs(data_dict, self.output_names,
                                 out[_first_output(out)])
        num_windows = int(np.ceil(max(T - W, 0) / S)) + 1
        total = (num_windows - 1) * S + W
        x_pad = jnp.pad(x, ((0, 0), (0, total - T), (0, 0)))
        # (B, num_windows, W, D) strided windows.
        idx = (jnp.arange(num_windows)[:, None] * S
               + jnp.arange(W)[None, :])
        windows = x_pad[:, idx]                     # (B, NW, W, D)
        stacked = windows.reshape(B * num_windows, W, D)
        win_lengths = jnp.full((B * num_windows,), W, jnp.int32)
        out = self.wrapped({self.input_names[0]: stacked},
                           lengths=win_lengths, training=training)
        y = out[_first_output(out)]
        out_dim = y.shape[-1]
        y = y.reshape(B, num_windows, W, out_dim)

        # Overlap-add with a triangular cross-fade weight.
        weight = jnp.minimum(jnp.arange(1, W + 1),
                             jnp.arange(W, 0, -1)).astype(jnp.float32)
        acc = jnp.zeros((B, total, out_dim))
        norm = jnp.zeros((B, total, 1))
        flat_idx = idx.reshape(-1)
        acc = acc.at[:, flat_idx].add(
            (y * weight[None, None, :, None]).reshape(B, -1, out_dim))
        norm = norm.at[:, flat_idx].add(
            jnp.broadcast_to(weight[None, None, :, None],
                             y.shape[:3] + (1,)).reshape(B, -1, 1))
        merged = acc / jnp.maximum(norm, 1e-6)
        return write_outputs(data_dict, self.output_names,
                             merged[:, :T])

    class Config(ModelConfig):
        def __init__(self, wrapped_model_config=None, window_size=500,
                     window_step=250, **kwargs):
            super().__init__(**kwargs)
            self.wrapped_model_config = wrapped_model_config
            self.window_size = window_size
            self.window_step = window_step

        def create_model(self):
            return WindowingWrapper(
                wrapped=self.wrapped_model_config.create_model(),
                input_names=self.input_names,
                output_names=self.output_names,
                window_size=self.window_size,
                window_step=self.window_step)


def _first_output(out):
    for key in out:
        if key.startswith("pred"):
            return key
    raise KeyError("No prediction in wrapped output dict.")
