"""Fused Pallas WaveNet sampler: the whole autoregressive generation
loop in one kernel launch.

The scan-based generator (`models/wavenet.py:_generate_scan`) pays XLA
loop machinery per audio sample — ~32 us/step measured (7.8x realtime
at B=4, 16 kHz).  Generation is pure latency: every weight of the
production net fits VMEM many times over (~1.6 MB bf16), so this
kernel keeps weights, ring buffers and the feedback path on-chip and
runs each sample as a short chain of small MXU matmuls:

- per layer, ONE matmul sits on the sequential chain:
  ``[past | x_{j-1} | z_{j-1} | cond] @ V_j`` yields the gate
  pre-activations, with the residual update lifted into the packed
  ``V_j`` (see ``pack_weights``) so the previous layer's skip/res
  matmul issues right behind it and its latency hides under the gate
  math;
- ring buffers live in one packed (sum(dilation+1), B_pad, R) bf16
  scratch; each slot is a clean (B_pad, R) tile read/write indexed by
  a scalar ``(t + 1) % size`` (the same O(1) ring addressing as the
  scan path, models/wavenet.py:156-158);
- the sampled feedback rides the ``fori_loop`` carry as a one-hot
  (B_pad, 256) register tile: embedding lookup is ``onehot @ table``
  (MXU), sampling is an inverse-CDF draw from ONE streamed uniform
  per step — no host round trip anywhere in the loop.

Numerics follow the TRAINING forward (bf16 matmuls, f32 state), not
the scan generator's all-f32 matvecs; the forced-teacher mode below
exists so tests can pin the kernel's logits against the parallel
teacher-forced network directly.

Reference role: r9y9 wavenet_vocoder ``incremental_forward``
(reference models/WaveNetWrapper.py:110-132) — the CUDA-side fast
sampler this replaces on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_INV_SQRT2 = float(1.0 / np.sqrt(2.0))
_TIME_BLOCK = 64
_VMEM_BUDGET = 14 * 1024 * 1024


def _make_kernel(dilations, R, Ca, S, C, out_channels, TB,
                 temperature, forced, want_logits, groups=1):
    """Build the kernel body for a static layer configuration.

    R: residual channels; Ca: gate half-width (z dim); S: skip
    channels; C: conditioning dim.  Weight layouts (driver-packed):
    wm1 (L, 2R+Ca+C, 2Ca) rows [W_past; W_cur(/sqrt2 via the lifted
    residual for j>0); W_res@W_cur/sqrt2; W_cond], b1 = gate+cond
    (+ lifted res-bias) biases; wm2 (L, Ca, S+R) cols
    [W_skip | W_res], b2 likewise.

    ``groups``: batch rows are split into ``groups`` independent
    sub-batches whose layer chains are INTERLEAVED inside the step
    body.  The per-sample chain is latency-bound (measured ~6 us/step
    nearly flat from Bp=8 to Bp=16): each layer's gate matmul waits on
    the previous layer's gate output, so the MXU sits idle most of the
    step.  Batch rows are independent, and issuing group g+1's layer-j
    matmul right behind group g's fills those pipeline gaps — the same
    rows, restructured so consecutive matmuls carry no data
    dependency.  Sub-batches must stay sublane-tileable
    (``Bp % (8 * groups) == 0``).
    """
    sizes = [d + 1 for d in dilations]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).tolist()

    def kernel(cond_ref, forced_ref, uniform_ref, embed_ref,
               wm1_ref, b1_ref, wm2_ref, b2_ref, p1_ref, p1b_ref,
               p2_ref, p2b_ref, samples_ref, *out_rest):
        # Logits are only materialised when requested (teacher-forced
        # parity tests / probing): production sampling discards them,
        # and writing (T, Bp, 256) f32 to HBM is pure waste there.
        if want_logits:
            logits_ref, buf_ref, oh_ref = out_rest
        else:
            buf_ref, oh_ref = out_rest
        Bp = cond_ref.shape[1]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            buf_ref[...] = jnp.zeros_like(buf_ref)
            # Feedback starts at the mu-law midpoint (scan parity:
            # models/wavenet.py:204).
            mid = out_channels // 2
            lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, 256), 1)
            oh_ref[...] = (lane == mid).astype(jnp.float32)


        def step(r, onehot):
            t = pid * TB + r
            G = groups
            Bg = Bp // G
            h0 = jnp.dot(onehot.astype(jnp.bfloat16), embed_ref[...],
                         preferred_element_type=jnp.float32)  # (Bp, R)
            c = cond_ref[r].astype(jnp.bfloat16)              # (Bp, C)
            zeros_ca = jnp.zeros((Bg, Ca), jnp.bfloat16)

            # One CHAIN matmul per layer per group: layer j's
            # current-sample contribution x_j @ W_cur is rewritten
            # through the residual update
            # x_j = (x_{j-1} + z_{j-1} @ W_res)/sqrt2 as
            # [x_{j-1} | z_{j-1}] @ V (driver-packed), so the skip/res
            # matmul of layer j-1 issues right AFTER layer j's chain
            # matmul and its latency hides under the gate math.  The G
            # groups' chain matmuls for layer j are mutually
            # independent and issue back-to-back, filling the MXU
            # pipeline the single chain leaves empty.
            xs = [h0[g * Bg:(g + 1) * Bg] for g in range(G)]
            cs = [c[g * Bg:(g + 1) * Bg] for g in range(G)]
            zs = [None] * G
            sk = [jnp.zeros((Bg, S), jnp.float32) for _ in range(G)]
            for j, (size, off) in enumerate(zip(sizes, offsets)):
                past = buf_ref[off + (t + 1) % size]          # (Bp, R)
                pres = []
                for g in range(G):
                    operand = jnp.concatenate(
                        [past[g * Bg:(g + 1) * Bg],
                         xs[g].astype(jnp.bfloat16),
                         zeros_ca if j == 0 else zs[g], cs[g]],
                        axis=1)
                    pres.append(
                        jnp.dot(operand, wm1_ref[j],
                                preferred_element_type=jnp.float32)
                        + b1_ref[j])
                if j == 0:
                    buf_ref[off + t % size] = \
                        h0.astype(jnp.bfloat16)
                else:
                    for g in range(G):
                        so = jnp.dot(
                            zs[g], wm2_ref[j - 1],
                            preferred_element_type=jnp.float32) \
                            + b2_ref[j - 1]
                        sk[g] = sk[g] + so[:, :S]
                        xs[g] = (xs[g] + so[:, S:S + R]) * _INV_SQRT2
                    buf_ref[off + t % size] = (
                        xs[0] if G == 1
                        else jnp.concatenate(xs, axis=0)
                    ).astype(jnp.bfloat16)
                zs = [(jnp.tanh(p[:, :Ca])
                       * jax.nn.sigmoid(p[:, Ca:2 * Ca])
                       ).astype(jnp.bfloat16) for p in pres]
            for g in range(G):
                so = jnp.dot(zs[g], wm2_ref[len(sizes) - 1],
                             preferred_element_type=jnp.float32) \
                    + b2_ref[len(sizes) - 1]
                sk[g] = sk[g] + so[:, :S]
            skips = sk[0] if G == 1 else jnp.concatenate(sk, axis=0)
            hh = jax.nn.relu(skips)
            hh = jnp.dot(hh.astype(jnp.bfloat16), p1_ref[...],
                         preferred_element_type=jnp.float32) \
                + p1b_ref[0]
            hh = jax.nn.relu(hh)
            # post2 is f32 in the training net (wavenet.py:85) — keep
            # the output layer full precision here too.
            logits = jnp.dot(hh, p2_ref[...],
                             preferred_element_type=jnp.float32) \
                + p2b_ref[0]                                 # (Bp, 256)
            if want_logits:
                logits_ref[r] = logits
            lane = jax.lax.broadcasted_iota(jnp.int32,
                                            (Bp, 256), 1)
            if forced:
                sample = forced_ref[r]                       # (Bp,)
            else:
                if temperature > 0.0:
                    # Inverse-CDF categorical draw: ONE uniform per
                    # (step, row), streamed in like cond.  Gumbel-max
                    # needs 256 noise values per step — generating
                    # them (in-kernel prng or host-side threefry) cost
                    # ~4-5 us/step, dwarfing the draw itself.  The
                    # lane cumsum is 8 shifted adds.
                    z = logits / temperature
                    z = z - jnp.max(z, axis=1, keepdims=True)
                    p = jnp.exp(z)       # padded classes: exp(-inf)=0
                    c = p
                    for k in (1, 2, 4, 8, 16, 32, 64, 128):
                        c = c + jnp.concatenate(
                            [jnp.zeros((Bp, k), jnp.float32),
                             c[:, :-k]], axis=1)
                    u = uniform_ref[r][:, None] \
                        * jnp.sum(p, axis=1, keepdims=True)
                    sample = jnp.sum((c < u).astype(jnp.int32),
                                     axis=1)
                else:
                    # Greedy: lane argmax via max + first-match select
                    # (padding classes never win: the driver pads
                    # post2's bias with -1e30).
                    m = jnp.max(logits, axis=1, keepdims=True)
                    sample = jnp.min(jnp.where(logits >= m, lane, 255),
                                     axis=1)
            samples_ref[r] = sample
            return (lane == sample[:, None]).astype(jnp.float32)

        oh_ref[...] = jax.lax.fori_loop(0, TB, step, oh_ref[...])

    return kernel


def generate_viable(config, B, C, dilations=None):
    """The kernel supports the production architecture family: k=2
    convs, gate split in half, lane-tileable channel sizes, mu-law
    classes <= 256, and everything resident in VMEM.  Pass the actual
    ``dilations`` the sampler will run with (defaults to the standard
    stacked-doubling schedule) so the ring-buffer estimate matches."""
    if not _HAS_PALLAS:
        return False
    R, G, S = (config.residual_channels, config.gate_channels,
               config.skip_channels)
    if config.kernel_size != 2 or G % 2 or config.out_channels > 256:
        return False
    if max(R, G // 2, S, C) > 128 or S + R > 128 or B > 32:
        return False
    dil = list(dilations) if dilations is not None else \
        [2 ** (i % (config.num_layers // config.num_stacks))
         for i in range(config.num_layers)]
    Bp = int(np.ceil(max(B, 1) / 8) * 8)
    slots = sum(d + 1 for d in dil)
    buf = slots * Bp * 128 * 2           # bf16, lanes padded to 128
    L = config.num_layers
    weights = (L * (2 * R + 128) * 128 + L * 128 * 128) * 2 \
        + 256 * 128 * 2 + 3 * 128 * 256 * 4
    blocks = _TIME_BLOCK * Bp * (128 + 256 + 8) * 4 * 2
    return buf + weights + blocks <= _VMEM_BUDGET


@partial(jax.jit, static_argnames=("dilations", "R", "Ca", "S", "C",
                                   "out_channels", "temperature",
                                   "forced", "want_logits",
                                   "interpret", "groups"))
def _generate_pallas(seed, cond, forced_seq, embed, wm1, b1, wm2, b2,
                     p1, p1b, p2, p2b, *, dilations, R, Ca, S, C,
                     out_channels, temperature, forced, want_logits,
                     interpret, groups=1):
    """cond: (T, Bp, C) f32; forced_seq: (T, Bp) int32 (zeros when
    unused); seed: python int or traced int32 scalar (a device scalar
    avoids a host sync on the serving path).
    Returns (samples (T, Bp) int32, logits (T, Bp, 256))."""
    T, Bp, _ = cond.shape
    TB = _TIME_BLOCK
    T_pad = int(np.ceil(T / TB) * TB)
    cond = jnp.pad(cond, ((0, T_pad - T), (0, 0), (0, 0)))
    forced_seq = jnp.pad(forced_seq, ((0, T_pad - T), (0, 0)))
    if not forced and temperature > 0.0:
        uniform = jax.random.uniform(
            jax.random.PRNGKey(seed), (T_pad, Bp), jnp.float32)
    else:
        uniform = jnp.zeros((T_pad, Bp), jnp.float32)
    slots = sum(d + 1 for d in dilations)

    kernel = _make_kernel(dilations, R, Ca, S, C, out_channels, TB,
                          temperature, forced, want_logits,
                          groups=groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, Bp, C), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((TB, Bp), lambda i, *_: (i, 0)),
            pl.BlockSpec((TB, Bp), lambda i, *_: (i, 0)),
            pl.BlockSpec(embed.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(wm1.shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(b1.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(wm2.shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(b2.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(p1.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(p1b.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(p2.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(p2b.shape, lambda i, *_: (0, 0)),
        ],
        out_specs=(
            [pl.BlockSpec((TB, Bp), lambda i, *_: (i, 0))]
            + ([pl.BlockSpec((TB, Bp, 256), lambda i, *_: (i, 0, 0))]
               if want_logits else [])),
        scratch_shapes=[
            pltpu.VMEM((slots, Bp, R), jnp.bfloat16),
            pltpu.VMEM((Bp, 256), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((T_pad, Bp), jnp.int32)]
            + ([jax.ShapeDtypeStruct((T_pad, Bp, 256), jnp.float32)]
               if want_logits else [])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cond, forced_seq, uniform,
      embed, wm1, b1, wm2, b2, p1, p1b, p2, p2b)
    samples = out[0][:T]
    return samples, (out[1][:T] if want_logits else None)


def pack_weights(wrapper_params, dilations, config, cond_dim):
    """Stack per-layer weights into the kernel's fused layouts."""
    L = len(dilations)
    R = config.residual_channels
    Ca = config.gate_channels // 2
    S = config.skip_channels
    C = cond_dim
    G2 = 2 * Ca

    def bf(x):
        return np.asarray(x, np.float32)

    inv_sqrt2 = float(1.0 / np.sqrt(2.0))
    wm1 = np.zeros((L, 2 * R + Ca + C, G2), np.float32)
    b1 = np.zeros((L, G2), np.float32)
    wm2 = np.zeros((L, Ca, S + R), np.float32)
    b2 = np.zeros((L, S + R), np.float32)
    for i in range(L):
        bp = wrapper_params["block_{}".format(i)]
        k = bf(bp["dilated"]["kernel"])          # (2, R, G2)
        wcur = k[1]
        wm1[i, :R] = k[0]                        # past block
        if i == 0:
            wm1[i, R:2 * R] = wcur               # x-block: x_0 direct
        else:
            # x_i = (x_{i-1} + z_{i-1} @ W_res + b_res)/sqrt2 lifted
            # into the fused operand [x_{i-1} | z_{i-1}].
            bpm1 = wrapper_params["block_{}".format(i - 1)]
            wres = bf(bpm1["res"]["kernel"])     # (Ca, R)
            bres = bf(bpm1["res"]["bias"])       # (R,)
            wm1[i, R:2 * R] = wcur * inv_sqrt2
            wm1[i, 2 * R:2 * R + Ca] = (wres @ wcur) * inv_sqrt2
            b1[i] += (bres @ wcur) * inv_sqrt2
        wm1[i, 2 * R + Ca:] = bf(bp["cond"]["kernel"])
        b1[i] += bf(bp["dilated"]["bias"]) + bf(bp["cond"]["bias"])
        wm2[i, :, :S] = bf(bp["skip"]["kernel"])
        wm2[i, :, S:] = bf(bp["res"]["kernel"])
        b2[i, :S] = bf(bp["skip"]["bias"])
        b2[i, S:] = bf(bp["res"]["bias"])
    # Embedding padded to the kernel's fixed 256-lane one-hot (classes
    # >= out_channels can never be sampled: p2's bias pads with -1e30).
    embed_raw = bf(wrapper_params["input_embed"]["embedding"])
    embed = np.zeros((256, embed_raw.shape[1]), np.float32)
    embed[:embed_raw.shape[0]] = embed_raw
    p1 = bf(wrapper_params["post1"]["kernel"])
    p1b = bf(wrapper_params["post1"]["bias"])[None]
    p2k = bf(wrapper_params["post2"]["kernel"])             # (S, out)
    p2b_row = bf(wrapper_params["post2"]["bias"])
    # Pad the class axis to 256 with a huge negative bias so padding
    # classes can never be sampled.
    out = p2k.shape[1]
    p2 = np.zeros((p2k.shape[0], 256), np.float32)
    p2[:, :out] = p2k
    p2b = np.full((1, 256), -1e30, np.float32)
    p2b[0, :out] = p2b_row
    to_b = lambda a: jnp.asarray(a).astype(jnp.bfloat16)
    return (to_b(embed), to_b(wm1), jnp.asarray(b1), to_b(wm2),
            jnp.asarray(b2), to_b(p1), jnp.asarray(p1b),
            jnp.asarray(p2), jnp.asarray(p2b))


class PackedSampler:
    """Pack-once front door for repeated generation.

    Packing + uploading the fused weight layouts is host work (~100 ms
    on a direct link; dominated by transfer latency on a tunneled
    device) — production serving does it once per checkpoint and then
    every call is a single device program."""

    def __init__(self, wrapper_params, dilations, config, cond_dim):
        self.dilations = tuple(dilations)
        self.config = config
        self.cond_dim = cond_dim
        self.packed = jax.device_put(
            pack_weights(wrapper_params, dilations, config, cond_dim))

    def __call__(self, cond, seed=0, temperature=1.0, forced=None,
                 want_logits=None, interpret=False, groups=None):
        """cond: (B, T, C) float32; forced: optional (B, T) int32
        teacher samples (logits-parity/testing mode — feedback comes
        from ``forced`` instead of sampling).
        Returns (samples (B, T) int32, logits (B, T, out_channels) or
        None).  Logits are materialised only in forced mode or with
        ``want_logits=True`` — production sampling skips the
        (T, B, 256) f32 HBM write entirely.

        ``seed`` may be a python int or a device int32 scalar (no host
        sync).  ``groups=None`` auto-picks the interleaving factor
        (one sub-batch per 8 padded rows, capped at 4 — see
        ``_make_kernel``); pass 1 to force the single-chain layout."""
        cfg = self.config
        B, T, C = cond.shape
        Bp = int(np.ceil(max(B, 1) / 8) * 8)
        if groups is None:
            # Largest interleave factor (capped at 4) that tiles the
            # padded batch: groups must divide Bp//8, or the kernel's
            # (8*groups)-row tiling check below rejects it (e.g.
            # Bp=40 -> Bp//8=5 -> groups=1; Bp=48 -> 6 -> 3).
            rows8 = Bp // 8
            groups = next(g for g in (4, 3, 2, 1) if rows8 % g == 0)
        if Bp % (8 * groups):
            raise ValueError("groups=%d does not tile Bp=%d"
                             % (groups, Bp))
        cond_t = jnp.transpose(
            jnp.pad(jnp.asarray(cond, jnp.float32),
                    ((0, Bp - B), (0, 0), (0, 0))), (1, 0, 2))
        if forced is not None:
            fseq = jnp.transpose(
                jnp.pad(jnp.asarray(forced, jnp.int32),
                        ((0, Bp - B), (0, 0))), (1, 0))
        else:
            fseq = jnp.zeros((T, Bp), jnp.int32)
        samples, logits = _generate_pallas(
            seed if hasattr(seed, "dtype") else int(seed),
            cond_t, fseq,
            *self.packed,
            dilations=self.dilations, R=cfg.residual_channels,
            Ca=cfg.gate_channels // 2, S=cfg.skip_channels, C=C,
            out_channels=cfg.out_channels,
            temperature=float(temperature), forced=forced is not None,
            want_logits=bool(forced is not None if want_logits is None
                             else want_logits),
            interpret=interpret, groups=int(groups))
        samples = jnp.transpose(samples, (1, 0))[:B]
        if logits is not None:
            logits = jnp.transpose(logits, (1, 0, 2))[:B, :,
                                                      :cfg.out_channels]
        return samples, logits


def generate_pallas(wrapper_params, dilations, config, cond, seed=0,
                    temperature=1.0, forced=None, want_logits=None,
                    interpret=False, groups=None):
    """One-shot convenience wrapper around :class:`PackedSampler`."""
    sampler = PackedSampler(wrapper_params, dilations, config,
                            cond.shape[-1])
    return sampler(cond, seed=seed, temperature=temperature,
                   forced=forced, want_logits=want_logits,
                   interpret=interpret, groups=groups)


def use_pallas_sampler():
    """Fused sampler on real single-device TPU only (same rationale
    and shard_map opt-in as pallas_lstm.use_pallas_recurrence)."""
    from idiaptts_tpu.ops import pallas_ctx

    return _HAS_PALLAS and pallas_ctx.fast_path_allowed()
