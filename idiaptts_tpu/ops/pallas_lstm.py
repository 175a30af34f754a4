"""Fused BiLSTM recurrence as a single Pallas TPU kernel.

The acoustic model's dominant cost is the sequential LSTM recurrence
(`models/rnn_dyn.py:_BiFastLSTM`): the input projection is hoisted out
as one large MXU matmul, but the per-step ``h @ W_h`` chain still runs
as a ``lax.scan`` whose loop body round-trips activations through XLA
loop machinery every ``unroll`` block.  This kernel runs the WHOLE
recurrence (both directions of one BiLSTM layer, all timesteps) in ONE
kernel launch:

- both directions ride ONE matmul per step via a block-diagonal
  packing: hidden states live in a ``(2*B_pad, 2F)`` scratch where
  forward rows occupy columns ``[0:F]`` and backward rows ``[F:2F]``
  (zeros elsewhere), so ``h_cat @ vstack(W_f, W_b)`` yields each row's
  own direction's gates — half the MXU instruction issues of two
  per-direction matmuls (measured 1.19x vs the XLA scan at the
  benchmark shape, bit-exact);
- ``vstack(W_f, W_b)`` stays resident in VMEM for the entire sequence
  (4 MB bf16 at F=512) — zero per-step weight traffic;
- the hidden/cell state persists in VMEM scratch across the
  (sequential) time-block grid, so the only HBM traffic is streaming
  the precomputed input projections in and the hidden states out,
  double-buffered by the Pallas pipeline;
- gate math is fused VPU code directly on the matmul output.

Numerical contract identical to ``_BiFastLSTM``'s scan body
(rnn_dyn.py:184-194): bf16 MXU matmuls with float32 accumulation and
float32 state, forget-gate bias +1.0, gate order [i, f, g, o].

Reference role: the pytorch reference runs its BiLSTMs through cuDNN
(`idiaptts/src/neural_networks/pytorch/models/rnn_dyn/RNNDyn.py`);
this is the TPU-native analogue of that fused-kernel path.
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

# Max time steps per grid block; the effective block is shrunk per
# shape so the double-buffered (TB, 2*B_pad, 4F) f32 input blocks plus
# weights and carry fit the ~16 MB scoped-VMEM limit (TB=32 already
# overflows it at the benchmark shape B=9/F=512).
_TIME_BLOCK = 8
_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def _pick_time_block(R, F, G, train=False, res_bytes=4):
    """Largest TB <= _TIME_BLOCK whose working set fits VMEM; 0 if even
    TB=1 cannot fit (caller falls back to the scan).  R is rounded up
    to the 8-row hardware tile for the estimate.  ``train`` adds the
    residual outputs the backward kernel consumes (post-activation
    gates 4F + cell states F, double-buffered) at ``res_bytes`` per
    element (4 = float32 streams, 2 = the bf16 streams of
    ``pallas_ctx.train_profile``)."""
    R = int(np.ceil(max(R, 1) / 8) * 8)
    weights = 2 * F * G * 2                       # bf16, resident
    carry = R * (2 * F + F) * 4                   # h + c scratch
    per_tb = R * (G + F) * 4 * 2                  # in+out, double-buffered
    if train:
        per_tb += R * (G + F) * res_bytes * 2     # gate + cell residuals
    budget = _VMEM_BUDGET - weights - carry
    if budget < per_tb:
        return 0
    return int(min(_TIME_BLOCK, budget // per_tb))


def _bilstm_kernel(xp_ref, wh_ref, out_ref, h_ref, c_ref):
    """One time-block of both LSTM directions.

    xp_ref:  (TB, 2*B_pad, 4F) f32  projections; rows = [fwd B_pad,
                               bwd B_pad], each direction padded to a
                               sublane multiple (unaligned direction
                               boundaries force masked scatters on the
                               critical path — measured 2.6x slower)
    wh_ref:  (2F, 4F) bf16     vstack(W_f, W_b), VMEM-resident
    out_ref: (TB, 2*B_pad, F) f32   hidden states
    h_ref:   (2*B_pad, 2F) f32 block-diagonal carry (see module
                               docstring); persists across grid
    c_ref:   (2*B_pad, F) f32  cell carry; persists across grid
    """
    tb = xp_ref.shape[0]
    F = wh_ref.shape[0] // 2
    Bp2 = h_ref.shape[0]
    Bp = Bp2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def step(t, _):
        rec = jnp.dot(h_ref[...].astype(jnp.bfloat16), wh_ref[...],
                      preferred_element_type=jnp.float32)
        gates = xp_ref[t] + rec                    # (2*B_pad, 4F)
        i_g = gates[:, 0 * F:1 * F]
        f_g = gates[:, 1 * F:2 * F]
        g_g = gates[:, 2 * F:3 * F]
        o_g = gates[:, 3 * F:4 * F]
        c = (jax.nn.sigmoid(f_g + 1.0) * c_ref[...]
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
        h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
        c_ref[...] = c
        # Scatter h into the block-diagonal layout; the off-diagonal
        # blocks stay zero so each row only sees its own weights.
        h_ref[0:Bp, 0:F] = h[0:Bp]
        h_ref[Bp:Bp2, F:2 * F] = h[Bp:Bp2]
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, tb, step, 0, unroll=True)


@partial(jax.jit, static_argnames=("interpret",))
def _recurrence_tmajor(xp_t, wh_cat, interpret=False):
    """Kernel driver on time-major, row-padded projections.

    xp_t: (T, 2*B_pad, 4F) float32, rows = [fwd B_pad, bwd B_pad] with
        each direction padded to a sublane multiple; wh_cat: (2F, 4F)
        = vstack(W_f, W_b).  Returns (T, 2*B_pad, F) hidden states.
    """
    T, R, G = xp_t.shape
    F = G // 4
    TB = _pick_time_block(R, F, G)
    if TB < 1 and not interpret:
        # Working set exceeds VMEM even at TB=1 (huge batch/width):
        # degrade to the scan instead of a ZeroDivision below.
        return _scan_tmajor(xp_t, wh_cat)
    TB = max(TB, 1)
    T_pad = int(np.ceil(T / TB) * TB)
    xp_t = jnp.pad(xp_t, ((0, T_pad - T), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _bilstm_kernel,
        grid=(T_pad // TB,),
        out_shape=jax.ShapeDtypeStruct((T_pad, R, F), jnp.float32),
        in_specs=[
            pl.BlockSpec((TB, R, G), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * F, G), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, 2 * F), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp_t, wh_cat.astype(jnp.bfloat16))
    return out[:T]


def _bilstm_kernel_train(xp_ref, wh_ref, out_ref, a_ref, cout_ref,
                         h_ref, c_ref):
    """Training-mode recurrence: identical math (and bit-identical h)
    to ``_bilstm_kernel``, additionally streaming out the backward
    kernel's residuals — post-activation gates [i,f,g,o] and cell
    states.  Only ever run under differentiation (custom_vjp fwd), so
    inference pays none of the extra HBM writes."""
    tb = xp_ref.shape[0]
    F = wh_ref.shape[0] // 2
    Bp2 = h_ref.shape[0]
    Bp = Bp2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def step(t, _):
        rec = jnp.dot(h_ref[...].astype(jnp.bfloat16), wh_ref[...],
                      preferred_element_type=jnp.float32)
        gates = xp_ref[t] + rec                    # (2*B_pad, 4F)
        i = jax.nn.sigmoid(gates[:, 0 * F:1 * F])
        f = jax.nn.sigmoid(gates[:, 1 * F:2 * F] + 1.0)
        g = jnp.tanh(gates[:, 2 * F:3 * F])
        o = jax.nn.sigmoid(gates[:, 3 * F:4 * F])
        c = f * c_ref[...] + i * g
        h = o * jnp.tanh(c)
        # Residual streams round to the output dtype (f32, or bf16
        # under pallas_ctx.train_profile); the carries stay f32 so the
        # hidden states remain bit-identical either way.
        a_ref[t, :, 0 * F:1 * F] = i.astype(a_ref.dtype)
        a_ref[t, :, 1 * F:2 * F] = f.astype(a_ref.dtype)
        a_ref[t, :, 2 * F:3 * F] = g.astype(a_ref.dtype)
        a_ref[t, :, 3 * F:4 * F] = o.astype(a_ref.dtype)
        cout_ref[t] = c.astype(cout_ref.dtype)
        c_ref[...] = c
        h_ref[0:Bp, 0:F] = h[0:Bp]
        h_ref[Bp:Bp2, F:2 * F] = h[Bp:Bp2]
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, tb, step, 0, unroll=True)


@partial(jax.jit, static_argnames=("res_bf16", "interpret"))
def _recurrence_train_tmajor(xp_t, wh_cat, res_bf16=False,
                             interpret=False):
    """Train-mode driver: returns (h, gates, cells), each time-major.
    Caller must have checked ``_pick_time_block(..., train=True)``.
    ``res_bf16`` streams the gate/cell residuals in bfloat16."""
    T, R, G = xp_t.shape
    F = G // 4
    rdt = jnp.bfloat16 if res_bf16 else jnp.float32
    TB = max(_pick_time_block(R, F, G, train=True,
                              res_bytes=2 if res_bf16 else 4), 1)
    T_pad = int(np.ceil(T / TB) * TB)
    xp_t = jnp.pad(xp_t, ((0, T_pad - T), (0, 0), (0, 0)))

    out, a, c = pl.pallas_call(
        _bilstm_kernel_train,
        grid=(T_pad // TB,),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, R, F), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, R, G), rdt),
            jax.ShapeDtypeStruct((T_pad, R, F), rdt),
        ),
        in_specs=[
            pl.BlockSpec((TB, R, G), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * F, G), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, R, G), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 2 * F), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp_t, wh_cat.astype(jnp.bfloat16))
    return out[:T], a[:T], c[:T]


def _pick_bwd_time_block(R, F, res_bytes=4):
    """Largest TB <= _TIME_BLOCK for the backward kernel: resident
    Wh^T (4F, 2F) bf16, f32 dh/dc carries, and double-buffered streams
    of gates + cells + shifted cells + output cotangent in (at
    ``res_bytes`` per element), dz out (always f32 — it feeds the db
    reduction directly)."""
    R = int(np.ceil(max(R, 1) / 8) * 8)
    G = 4 * F
    weights = G * 2 * F * 2
    carry = R * 2 * F * 4
    per_tb = R * ((G + 3 * F) * res_bytes + G * 4) * 2
    budget = _VMEM_BUDGET - weights - carry
    if budget < per_tb:
        return 0
    return int(min(_TIME_BLOCK, budget // per_tb))


def _bilstm_bwd_kernel(a_ref, c_ref, cprev_ref, gout_ref, whT_ref,
                       dz_ref, dh_ref, dc_ref, dz_s):
    """Reverse-time LSTM backward: the SEQUENTIAL part only.

    Walks the time blocks in reverse grid order (index maps reverse the
    block index) and each block's steps newest-first, carrying the
    recurrent cotangents dh/dc in VMEM.  Per step: VPU gate-derivative
    math on the saved activations, then ONE block-diagonal matmul
    ``dz @ Wh_cat^T`` feeding both directions' dh (same packing trick
    as the forward).  Everything non-sequential — dWh/dWx/dx/db — is
    left to large XLA matmuls outside the kernel, where the MXU gets
    full T*R-row tiles.

    a_ref:     (TB, R, 4F) f32  post-activation gates [i, f, g, o]
    c_ref:     (TB, R, F) f32   cell states c_t
    cprev_ref: (TB, R, F) f32   c_{t-1} (zeros at t=0)
    gout_ref:  (TB, R, F) f32   upstream cotangent dL/dh_t
    whT_ref:   (4F, 2F) bf16    Wh_cat^T, VMEM-resident
    dz_ref:    (TB, R, 4F) f32  out: pre-activation gate cotangents
    dh_ref:    (R, F) f32       carry: recurrent dh (per-row direction)
    dc_ref:    (R, F) f32       carry: dc
    dz_s:      (R, 4F) f32      scratch: current step's dz
    """
    tb = a_ref.shape[0]
    F = whT_ref.shape[1] // 2
    Bp2 = dh_ref.shape[0]
    Bp = Bp2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    def step(k, _):
        t = tb - 1 - k
        # Residual streams may arrive bf16 (train_profile); all the
        # derivative math runs f32 on the VPU after the upcast.
        a = a_ref[t].astype(jnp.float32)
        i = a[:, 0 * F:1 * F]
        f = a[:, 1 * F:2 * F]
        g = a[:, 2 * F:3 * F]
        o = a[:, 3 * F:4 * F]
        tc = jnp.tanh(c_ref[t].astype(jnp.float32))
        dh_tot = gout_ref[t].astype(jnp.float32) + dh_ref[...]
        dc = dc_ref[...] + dh_tot * o * (1.0 - tc * tc)
        dz_s[:, 0 * F:1 * F] = dc * g * (i * (1.0 - i))
        dz_s[:, 1 * F:2 * F] = (dc * cprev_ref[t].astype(jnp.float32)
                                * (f * (1.0 - f)))
        dz_s[:, 2 * F:3 * F] = dc * i * (1.0 - g * g)
        dz_s[:, 3 * F:4 * F] = dh_tot * tc * (o * (1.0 - o))
        dc_ref[...] = dc * f
        dz = dz_s[...]
        dz_ref[t] = dz
        # One matmul serves both directions: Wh_cat^T's column blocks
        # [0:F] / [F:2F] are W_f^T / W_b^T, and each row's direction
        # reads only its own block (the cross block multiplies the
        # other direction's weights — discarded).
        dhp = jnp.dot(dz.astype(jnp.bfloat16), whT_ref[...],
                      preferred_element_type=jnp.float32)
        dh_ref[0:Bp, :] = dhp[0:Bp, 0:F]
        dh_ref[Bp:Bp2, :] = dhp[Bp:Bp2, F:2 * F]
        return 0

    jax.lax.fori_loop(0, tb, step, 0, unroll=True)


@partial(jax.jit, static_argnames=("interpret",))
def _dz_bwd_tmajor(a, c, gout, wh_cat, interpret=False):
    """Backward-kernel driver: pre-activation gate cotangents dz
    (T, R, 4F) from the saved residuals and the upstream cotangent.
    Caller must have checked ``_pick_bwd_time_block``."""
    T, R, G = a.shape
    F = G // 4
    res_bytes = 2 if a.dtype == jnp.bfloat16 else 4
    TB = max(_pick_bwd_time_block(R, F, res_bytes), 1)
    T_pad = int(np.ceil(T / TB) * TB)
    cprev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    pad = ((0, T_pad - T), (0, 0), (0, 0))
    # Zero padding keeps the carries exact: padded steps see zero
    # gates/cotangents, so dz=0 and dh/dc stay untouched through them.
    # The upstream cotangent rides the residual dtype (bf16 under
    # train_profile) so its stream is as cheap as the saved gates.
    a = jnp.pad(a, pad)
    c = jnp.pad(c, pad)
    cprev = jnp.pad(cprev, pad)
    gout = jnp.pad(gout.astype(a.dtype), pad)
    nb = T_pad // TB

    def rev(i):
        return (nb - 1 - i, 0, 0)

    dz = pl.pallas_call(
        _bilstm_bwd_kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((T_pad, R, G), jnp.float32),
        in_specs=[
            pl.BlockSpec((TB, R, G), rev),
            pl.BlockSpec((TB, R, F), rev),
            pl.BlockSpec((TB, R, F), rev),
            pl.BlockSpec((TB, R, F), rev),
            pl.BlockSpec((G, 2 * F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, R, G), rev),
        scratch_shapes=[
            pltpu.VMEM((R, F), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
            pltpu.VMEM((R, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a, c, cprev, gout, jnp.transpose(wh_cat).astype(jnp.bfloat16))
    return dz[:T]


def _dwh_from_dz(h, dz, F):
    """dWh_cat = sum_t h_cat[t-1]^T @ dz[t], per direction, as two
    large MXU matmuls (T*R contraction rows) — bf16 inputs, f32
    accumulation, the same rounding class as the forward matmuls."""
    Bp = h.shape[1] // 2
    hprev = jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]],
                            axis=0).astype(jnp.bfloat16)
    dz16 = dz.astype(jnp.bfloat16)
    dwh_f = jnp.einsum("trf,trg->fg", hprev[:, :Bp], dz16[:, :Bp],
                       preferred_element_type=jnp.float32)
    dwh_b = jnp.einsum("trf,trg->fg", hprev[:, Bp:], dz16[:, Bp:],
                       preferred_element_type=jnp.float32)
    return jnp.concatenate([dwh_f, dwh_b], axis=0)


def pallas_viable(B, F):
    """True when the kernel beats the scan for this shape: lane-aligned
    gates and a batch small enough that full time blocks fit VMEM
    (large batches force tiny blocks AND give the XLA scan full MXU row
    tiles anyway — measured faster there: batch 72 capacity 3476x scan
    vs 3198x kernel)."""
    if F % 128 != 0:
        return False
    Bp = int(np.ceil(max(B, 1) / 8) * 8)
    G = 4 * F
    return _pick_time_block(2 * Bp, F, G) >= _TIME_BLOCK


def train_viable(B, F):
    """Recurrence-kernel dispatch gate for TRAINING-step traces
    (``pallas_ctx.train_profile``).  Unlike ``pallas_viable`` — which
    hands large batches to the scan because the inference scan gets
    full MXU row tiles there — training keeps the kernel up to a full
    128-row MXU tile (B=64): the scan's VJP saves ~T*B*5F float32
    residuals per layer (x_proj alone is 2 GB at B=64/T=1024/F=512)
    and goes HBM-bound in the backward, while the fused backward
    streams half that (bf16) with no forward recompute."""
    if F % 128 != 0:
        return False
    Bp = int(np.ceil(max(B, 1) / 8) * 8)
    R = 2 * Bp
    if R > 128:
        return False
    G = 4 * F
    rb = 2 if _residuals_bf16_now() else 4
    return (_pick_time_block(R, F, G, train=True, res_bytes=rb) >= 2
            and _pick_bwd_time_block(R, F, rb) >= 2)


def layer_train_viable(B, D, F):
    """Fused-projection-layer dispatch gate for training-step traces:
    the train-mode layer kernel additionally streams the backward
    residuals, so its VMEM calculus differs from ``layer_viable``."""
    if F % 128 != 0:
        return False
    Bp = int(np.ceil(max(B, 1) / 8) * 8)
    R = 2 * Bp
    if R > 128:
        return False
    rb = 2 if _residuals_bf16_now() else 4
    return (_pick_layer_time_block(R, D, F, train=True,
                                   res_bytes=rb) >= 2
            and _pick_bwd_time_block(R, F, rb) >= 2)


@partial(jax.jit, static_argnames=("interpret",))
def bilstm_recurrence_pallas(x_proj, wh, interpret=False):
    """Both-direction LSTM recurrence over precomputed projections.

    x_proj: (2, B, T, 4F) float32 — per-direction input projections
        with bias already added (direction 1 pre-reversed, exactly as
        ``_BiFastLSTM`` lays it out).
    wh: (2, F, 4F) — recurrent weight matrices.
    Returns hidden states (2, B, T, F) float32.
    """
    _, B, T, G = x_proj.shape
    F = G // 4
    if not interpret and not pallas_viable(B, F):
        return bilstm_recurrence_scan(x_proj, wh)
    Bp = int(np.ceil(max(B, 1) / 8) * 8)

    # (T, 2*B_pad, 4F): time leading so each grid block is a clean
    # (TB, 2*B_pad, 4F) slab with (sublane, lane) = (2*B_pad, 4F)
    # tiles, each direction padded to the sublane multiple.
    xp = jnp.transpose(x_proj, (2, 0, 1, 3))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Bp - B), (0, 0)))
    xp = xp.reshape(T, 2 * Bp, G)
    wh_cat = jnp.concatenate([wh[0], wh[1]], axis=0)   # (2F, 4F)

    out = _recurrence_tmajor(xp, wh_cat, interpret=interpret)
    out = out.reshape(T, 2, Bp, F)[:, :, :B]
    return jnp.transpose(out, (1, 2, 0, 3))


def bilstm_recurrence_scan(x_proj, wh, unroll=16):
    """Reference scan implementation (same math as _BiFastLSTM)."""
    _, B, _, G = x_proj.shape
    F = G // 4
    wh_b = wh.astype(jnp.bfloat16)

    def step(carry, xp_t):
        h, c = carry
        rec = jnp.einsum("dbf,dfg->dbg", h.astype(jnp.bfloat16),
                         wh_b).astype(jnp.float32)
        gates = xp_t + rec
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((2, B, F)), jnp.zeros((2, B, F)))
    _, hs = jax.lax.scan(step, init, jnp.moveaxis(x_proj, 2, 0),
                         unroll=unroll)
    return jnp.moveaxis(hs, 0, 2)


def _scan_tmajor(xp_t, wh_cat):
    """Scan-path equivalent of ``_recurrence_tmajor`` (used as the VJP
    backward and as the correctness oracle)."""
    T, R, G = xp_t.shape
    F = G // 4
    Bp = R // 2
    xp = jnp.transpose(xp_t.reshape(T, 2, Bp, G), (1, 2, 0, 3))
    out = bilstm_recurrence_scan(xp, wh_cat.reshape(2, F, G))
    return jnp.transpose(out, (2, 0, 1, 3)).reshape(T, R, F)


def _interpret_now():
    """Trace-time interpret flag (pallas_ctx.force_interpret): lets CPU
    tests and the multi-chip dryrun execute the real kernel bodies."""
    from idiaptts_tpu.ops import pallas_ctx

    return pallas_ctx.interpret_forced()


@jax.custom_vjp
def bilstm_recurrence_tmajor(xp_t, wh_cat):
    """Differentiable fused recurrence on time-major projections:
    Pallas kernel forward AND backward.  Under differentiation the
    train-mode forward additionally streams out post-activation gates
    and cell states, and the backward runs the reverse-time Pallas
    kernel on them (no forward recompute); dWh is two large MXU
    matmuls on the saved states.  Falls back to the scan VJP when the
    residual working set cannot fit VMEM.

    xp_t: (T, 2*B_pad, 4F) f32; wh_cat: (2F, 4F).  -> (T, 2*B_pad, F).
    """
    return _recurrence_tmajor(xp_t, wh_cat, interpret=_interpret_now())


def _residuals_bf16_now():
    """Trace-time residual-precision flag (pallas_ctx.train_profile)."""
    from idiaptts_tpu.ops import pallas_ctx

    return pallas_ctx.train_residuals_bf16()


def _bilstm_fwd(xp_t, wh_cat):
    interp = _interpret_now()
    T, R, G = xp_t.shape
    F = G // 4
    rb = 2 if _residuals_bf16_now() else 4
    if (_pick_time_block(R, F, G, train=True, res_bytes=rb) >= 1
            and _pick_bwd_time_block(R, F, rb) >= 1):
        h, a, c = _recurrence_train_tmajor(xp_t, wh_cat,
                                           res_bf16=(rb == 2),
                                           interpret=interp)
        return h, (None, wh_cat, h, a, c)
    return (_recurrence_tmajor(xp_t, wh_cat, interpret=interp),
            (xp_t, wh_cat, None, None, None))


def _bilstm_bwd(res, g):
    xp_t, wh_cat, h, a, c = res
    if a is None:
        _, vjp = jax.vjp(_scan_tmajor, xp_t, wh_cat)
        return vjp(g)
    dz = _dz_bwd_tmajor(a, c, g, wh_cat, interpret=_interpret_now())
    return dz, _dwh_from_dz(h, dz, wh_cat.shape[0] // 2)


bilstm_recurrence_tmajor.defvjp(_bilstm_fwd, _bilstm_bwd)


def use_pallas_recurrence():
    """Pallas fast path on real single-device TPU only.

    Elsewhere the scan runs: the CPU interpreter is for parity tests,
    not speed, and under a multi-device GSPMD mesh a ``pallas_call``
    has no partitioning rule — the data-parallel trainer keeps the
    scan formulation, which XLA shards cleanly.  Inside a ``shard_map``
    each per-device program may opt back in via
    ``pallas_ctx.force_single_device`` (the sharded serving pipeline
    does)."""
    from idiaptts_tpu.ops import pallas_ctx

    return _HAS_PALLAS and pallas_ctx.fast_path_allowed()


# ---------------------------------------------------------------------
# Full-layer kernel: input projection fused with the recurrence.
#
# Materialising the projections (T, 2*B_pad, 4F) in f32 costs two HBM
# round trips of ~0.5 GB at the headline shape (einsum write + kernel
# read), plus the transpose XLA emits to reach the time-major layout.
# Fusing the projection into the kernel streams the raw bf16 inputs
# instead (4x smaller) and keeps the projections in a VMEM scratch that
# never leaves the chip.
# ---------------------------------------------------------------------


def _bilstm_layer_kernel(xin_ref, wx_ref, wh_ref, b_ref, out_ref,
                         xp_ref, h_ref, c_ref):
    """One time-block: project inputs for the block (one 128-row MXU
    matmul per direction), then run the recurrence steps.

    xin_ref: (TB, 2*B_pad, D) bf16  raw inputs; rows = [fwd, bwd]
    wx_ref:  (2, D, 4F) bf16        input projections, VMEM-resident
    wh_ref:  (2F, 4F) bf16          vstack(W_f, W_b), VMEM-resident
    b_ref:   (2, 4F) f32            biases
    out_ref: (TB, 2*B_pad, F) f32   hidden states
    xp_ref:  (TB, 2*B_pad, 4F) f32  scratch: this block's projections
    h_ref:   (2*B_pad, 2F) f32      block-diagonal carry
    c_ref:   (2*B_pad, F) f32       cell carry
    """
    tb = xin_ref.shape[0]
    D = xin_ref.shape[2]
    F = wh_ref.shape[0] // 2
    Bp2 = h_ref.shape[0]
    Bp = Bp2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    xv = xin_ref[...]
    for d in range(2):
        xd = xv[:, d * Bp:(d + 1) * Bp, :].reshape(tb * Bp, D)
        m = jnp.dot(xd, wx_ref[d],
                    preferred_element_type=jnp.float32)
        # The scan path's einsum emits a bf16 result (f32 MXU
        # accumulation, bf16 output) before upcasting — round the same
        # way so kernel and scan are bit-identical.
        m = m.astype(jnp.bfloat16).astype(jnp.float32)
        xp_ref[:, d * Bp:(d + 1) * Bp, :] = \
            m.reshape(tb, Bp, 4 * F) + b_ref[d]

    def step(t, _):
        rec = jnp.dot(h_ref[...].astype(jnp.bfloat16), wh_ref[...],
                      preferred_element_type=jnp.float32)
        gates = xp_ref[t] + rec
        i_g = gates[:, 0 * F:1 * F]
        f_g = gates[:, 1 * F:2 * F]
        g_g = gates[:, 2 * F:3 * F]
        o_g = gates[:, 3 * F:4 * F]
        c = (jax.nn.sigmoid(f_g + 1.0) * c_ref[...]
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
        h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
        c_ref[...] = c
        h_ref[0:Bp, 0:F] = h[0:Bp]
        h_ref[Bp:Bp2, F:2 * F] = h[Bp:Bp2]
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, tb, step, 0, unroll=True)


def _pick_layer_time_block(R, D, F, train=False, res_bytes=4):
    """Largest TB <= _TIME_BLOCK for the fused-projection kernel.
    ``train`` adds the gate/cell residual outputs at ``res_bytes`` per
    element (2 = the bf16 streams of ``pallas_ctx.train_profile``)."""
    R = int(np.ceil(max(R, 1) / 8) * 8)
    Dp = int(np.ceil(max(D, 1) / 8) * 8)
    G = 4 * F
    weights = 2 * Dp * G * 2 + 2 * F * G * 2 + 2 * G * 4
    carry = R * (2 * F + F) * 4
    # per-TB: bf16 in + f32 out, double-buffered, + f32 xp scratch
    per_tb = R * (Dp * 2 + F * 4) * 2 + R * G * 4
    if train:
        per_tb += R * (G + F) * res_bytes * 2     # gate + cell residuals
    budget = _VMEM_BUDGET - weights - carry
    if budget < per_tb:
        return 0
    return int(min(_TIME_BLOCK, budget // per_tb))


def layer_viable(B, D, F):
    """True when the fused-projection layer kernel fits VMEM with a
    worthwhile time block.  Unlike ``pallas_viable``, small blocks here
    usually mean the RESIDENT WEIGHTS (W_x grows with D) squeezed the
    budget, not a big batch — and the fusion still wins: measured
    1.45x vs the scan layer even at TB=3 (B=9, D=1024, F=512)."""
    if F % 128 != 0:
        return False
    Bp = int(np.ceil(max(B, 1) / 8) * 8)
    if Bp > 32:      # large batches: full MXU row tiles favour the scan
        return False
    return _pick_layer_time_block(2 * Bp, D, F) >= 3


@partial(jax.jit, static_argnames=("interpret",))
def _layer_tmajor(xin_t, wx, wh_cat, b, interpret=False):
    """Fused projection+recurrence driver.

    xin_t: (T, 2*B_pad, D) bfloat16, rows = [fwd B_pad, bwd B_pad]
        (direction 1 pre-reversed); wx: (2, D, 4F); wh_cat: (2F, 4F);
    b: (2, 4F).  Returns (T, 2*B_pad, F) float32 hidden states.
    """
    T, R, D = xin_t.shape
    F = wh_cat.shape[0] // 2
    TB = _pick_layer_time_block(R, D, F)
    if TB < 1 and not interpret:
        return _scan_layer_tmajor(xin_t, wx, wh_cat, b)
    TB = max(TB, 1)
    T_pad = int(np.ceil(T / TB) * TB)
    xin_t = jnp.pad(xin_t, ((0, T_pad - T), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _bilstm_layer_kernel,
        grid=(T_pad // TB,),
        out_shape=jax.ShapeDtypeStruct((T_pad, R, F), jnp.float32),
        in_specs=[
            pl.BlockSpec((TB, R, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, D, 4 * F), lambda i: (0, 0, 0)),
            pl.BlockSpec((2 * F, 4 * F), lambda i: (0, 0)),
            pl.BlockSpec((2, 4 * F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((TB, R, 4 * F), jnp.float32),
            pltpu.VMEM((R, 2 * F), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xin_t, wx.astype(jnp.bfloat16), wh_cat.astype(jnp.bfloat16),
      b.astype(jnp.float32))
    return out[:T]


def _scan_layer_tmajor(xin_t, wx, wh_cat, b):
    """Scan-path equivalent of ``_layer_tmajor`` (VJP backward and
    correctness oracle): same bf16 projection + bias + recurrence.

    ``preferred_element_type=f32`` + explicit bf16 round pins the
    TPU MXU semantics (f32 accumulation, bf16 result) so the oracle is
    platform-stable — a plain bf16 einsum on XLA CPU accumulates in
    bf16, which neither the TPU scan nor the kernel does."""
    T, R, D = xin_t.shape
    F = wh_cat.shape[0] // 2
    Bp = R // 2
    xd = jnp.transpose(xin_t.reshape(T, 2, Bp, D), (1, 2, 0, 3))
    x_proj = jnp.einsum("dbtc,dcg->dbtg", xd.astype(jnp.bfloat16),
                        wx.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16).astype(jnp.float32) \
        + b[:, None, None, :]
    out = bilstm_recurrence_scan(x_proj, wh_cat.reshape(2, F, 4 * F))
    return jnp.transpose(out, (2, 0, 1, 3)).reshape(T, R, F)


def _bilstm_layer_kernel_train(xin_ref, wx_ref, wh_ref, b_ref, out_ref,
                               a_ref, cout_ref, xp_ref, h_ref, c_ref):
    """Training-mode fused layer: identical math (and bit-identical h)
    to ``_bilstm_layer_kernel``, additionally streaming out the
    backward residuals (post-activation gates + cell states)."""
    tb = xin_ref.shape[0]
    D = xin_ref.shape[2]
    F = wh_ref.shape[0] // 2
    Bp2 = h_ref.shape[0]
    Bp = Bp2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    xv = xin_ref[...]
    for d in range(2):
        xd = xv[:, d * Bp:(d + 1) * Bp, :].reshape(tb * Bp, D)
        m = jnp.dot(xd, wx_ref[d],
                    preferred_element_type=jnp.float32)
        m = m.astype(jnp.bfloat16).astype(jnp.float32)
        xp_ref[:, d * Bp:(d + 1) * Bp, :] = \
            m.reshape(tb, Bp, 4 * F) + b_ref[d]

    def step(t, _):
        rec = jnp.dot(h_ref[...].astype(jnp.bfloat16), wh_ref[...],
                      preferred_element_type=jnp.float32)
        gates = xp_ref[t] + rec
        i = jax.nn.sigmoid(gates[:, 0 * F:1 * F])
        f = jax.nn.sigmoid(gates[:, 1 * F:2 * F] + 1.0)
        g = jnp.tanh(gates[:, 2 * F:3 * F])
        o = jax.nn.sigmoid(gates[:, 3 * F:4 * F])
        c = f * c_ref[...] + i * g
        h = o * jnp.tanh(c)
        a_ref[t, :, 0 * F:1 * F] = i.astype(a_ref.dtype)
        a_ref[t, :, 1 * F:2 * F] = f.astype(a_ref.dtype)
        a_ref[t, :, 2 * F:3 * F] = g.astype(a_ref.dtype)
        a_ref[t, :, 3 * F:4 * F] = o.astype(a_ref.dtype)
        cout_ref[t] = c.astype(cout_ref.dtype)
        c_ref[...] = c
        h_ref[0:Bp, 0:F] = h[0:Bp]
        h_ref[Bp:Bp2, F:2 * F] = h[Bp:Bp2]
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, tb, step, 0, unroll=True)


@partial(jax.jit, static_argnames=("res_bf16", "interpret"))
def _layer_train_tmajor(xin_t, wx, wh_cat, b, res_bf16=False,
                        interpret=False):
    """Train-mode fused-layer driver: returns (h, gates, cells).
    Caller must have checked ``_pick_layer_time_block(train=True)``.
    ``res_bf16`` streams the gate/cell residuals in bfloat16."""
    T, R, D = xin_t.shape
    F = wh_cat.shape[0] // 2
    G = 4 * F
    rdt = jnp.bfloat16 if res_bf16 else jnp.float32
    TB = max(_pick_layer_time_block(R, D, F, train=True,
                                    res_bytes=2 if res_bf16 else 4), 1)
    T_pad = int(np.ceil(T / TB) * TB)
    xin_t = jnp.pad(xin_t, ((0, T_pad - T), (0, 0), (0, 0)))

    out, a, c = pl.pallas_call(
        _bilstm_layer_kernel_train,
        grid=(T_pad // TB,),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, R, F), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, R, G), rdt),
            jax.ShapeDtypeStruct((T_pad, R, F), rdt),
        ),
        in_specs=[
            pl.BlockSpec((TB, R, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, D, G), lambda i: (0, 0, 0)),
            pl.BlockSpec((2 * F, G), lambda i: (0, 0)),
            pl.BlockSpec((2, G), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, R, G), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, R, F), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, R, G), jnp.float32),
            pltpu.VMEM((R, 2 * F), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xin_t, wx.astype(jnp.bfloat16), wh_cat.astype(jnp.bfloat16),
      b.astype(jnp.float32))
    return out[:T], a[:T], c[:T]


@jax.custom_vjp
def bilstm_layer_tmajor(xin_t, wx, wh_cat, b):
    """Differentiable fused BiLSTM layer (projection + recurrence):
    Pallas forward AND backward.  Under differentiation the train-mode
    forward additionally saves post-activation gates + cell states; the
    backward runs the reverse-time Pallas kernel for the sequential dz
    chain and computes dWx/dWh/dx/db as large MXU matmuls on the
    saved residuals (no forward recompute).  Falls back to the scan
    VJP when the residual working set cannot fit VMEM."""
    return _layer_tmajor(xin_t, wx, wh_cat, b,
                         interpret=_interpret_now())


def _layer_fwd(xin_t, wx, wh_cat, b):
    interp = _interpret_now()
    T, R, D = xin_t.shape
    F = wh_cat.shape[0] // 2
    rb = 2 if _residuals_bf16_now() else 4
    if (_pick_layer_time_block(R, D, F, train=True, res_bytes=rb) >= 1
            and _pick_bwd_time_block(R, F, rb) >= 1):
        h, a, c = _layer_train_tmajor(xin_t, wx, wh_cat, b,
                                      res_bf16=(rb == 2),
                                      interpret=interp)
        return h, (xin_t, wx, wh_cat, None, h, a, c)
    return (_layer_tmajor(xin_t, wx, wh_cat, b, interpret=interp),
            (xin_t, wx, wh_cat, b, None, None, None))


def _layer_bwd(res, g):
    xin_t, wx, wh_cat, b, h, a, c = res
    if a is None:
        _, vjp = jax.vjp(_scan_layer_tmajor, xin_t, wx, wh_cat, b)
        return vjp(g)
    F = wh_cat.shape[0] // 2
    Bp = xin_t.shape[1] // 2
    dz = _dz_bwd_tmajor(a, c, g, wh_cat, interpret=_interpret_now())
    dwh = _dwh_from_dz(h, dz, F)
    dz16 = dz.astype(jnp.bfloat16)
    wx16 = wx.astype(jnp.bfloat16)
    # Projection gradients as full-size MXU matmuls (T*R contraction /
    # batch rows) — bf16 inputs, f32 accumulation, matching the scan
    # VJP's rounding class.
    dwx = jnp.stack([
        jnp.einsum("trd,trg->dg", xin_t[:, :Bp], dz16[:, :Bp],
                   preferred_element_type=jnp.float32),
        jnp.einsum("trd,trg->dg", xin_t[:, Bp:], dz16[:, Bp:],
                   preferred_element_type=jnp.float32)])
    db = jnp.stack([jnp.sum(dz[:, :Bp], axis=(0, 1)),
                    jnp.sum(dz[:, Bp:], axis=(0, 1))])
    dx_f = jnp.einsum("trg,dg->trd", dz16[:, :Bp], wx16[0],
                      preferred_element_type=jnp.float32)
    dx_b = jnp.einsum("trg,dg->trd", dz16[:, Bp:], wx16[1],
                      preferred_element_type=jnp.float32)
    dxin = jnp.concatenate([dx_f, dx_b], axis=1).astype(xin_t.dtype)
    return dxin, dwx, dwh, db


bilstm_layer_tmajor.defvjp(_layer_fwd, _layer_bwd)
