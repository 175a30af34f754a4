"""Named loss family: dict-protocol losses with masks and reductions.

Capability parity with the reference's loss zoo
(``loss/NamedLoss.py`` :16-131 — seq-mask multiply, reductions
mean_per_frame / mean_per_sample / mean / sum / none, start_step and
loss_weight; ``VAEKLDLoss.py`` :14-60 KLD with annealing;
``WMSELoss.py`` :13-93 / ``L1WeightedVUVMSELoss.py`` :13-34 per-index
weighting; ``WeightedNonzeroMSELoss.py`` :15-107 and the atom variant
:52-68; ``OneHotCrossEntropyLoss.py`` :9-16;
``DiscretizedMixturelogisticLoss.py`` :23-112;
``UnWeightedAccuracy.py`` :11-20).

All losses are pure jnp functions of ``(data_dict, step)`` returning a
scalar; they read predictions and targets by name from the dict and use
``_seq_mask`` when ``seq_mask`` is enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np


class NamedLoss:
    """Wrapper binding a loss function to named inputs/targets."""

    REDUCTIONS = ("mean_per_frame", "mean_per_sample", "mean", "sum",
                  "none")

    class Config:
        def __init__(self, name, type_, input_names, seq_mask=None,
                     reduction="mean_per_frame", loss_weight=1.0,
                     start_step=0, **kwargs):
            self.name = name
            self.type = type_
            self.input_names = tuple(input_names)
            self.seq_mask = seq_mask
            self.reduction = reduction
            self.loss_weight = loss_weight
            self.start_step = start_step
            self.kwargs = kwargs

        def create_loss(self):
            return NamedLoss(self)

    _FUNCTIONS = {}

    @classmethod
    def register(cls, name):
        def deco(fn):
            cls._FUNCTIONS[name] = fn
            return fn
        return deco

    def __init__(self, config):
        self.config = config
        self.name = config.name
        if config.type not in self._FUNCTIONS:
            raise NotImplementedError("Unknown loss type " + config.type)
        self.fn = self._FUNCTIONS[config.type]
        import inspect
        self._wants_step = "step" in inspect.signature(
            self.fn).parameters

    def __call__(self, data_dict, step=0):
        cfg = self.config
        pred = jnp.asarray(data_dict[cfg.input_names[0]])
        target = jnp.asarray(data_dict[cfg.input_names[1]]) \
            if len(cfg.input_names) > 1 else None
        extra = {"step": step} if self._wants_step else {}
        per_elem = self.fn(pred, target, data_dict, **extra,
                           **cfg.kwargs)
        mask = None
        if cfg.seq_mask is not None:
            mask = jnp.asarray(data_dict[cfg.seq_mask])
            while mask.ndim < per_elem.ndim:
                mask = mask[..., None]
            mask = jnp.broadcast_to(mask[..., :1] if
                                    mask.shape[-1] != per_elem.shape[-1]
                                    and mask.shape[-1] == 1 else mask,
                                    per_elem.shape[:mask.ndim]
                                    + per_elem.shape[mask.ndim:])
            per_elem = per_elem * mask
        loss = self._reduce(per_elem, mask, cfg.reduction)
        weight = cfg.loss_weight
        active = jnp.asarray(step >= cfg.start_step, loss.dtype if
                             hasattr(loss, "dtype") else jnp.float32)
        return loss * weight * active

    @staticmethod
    def _reduce(per_elem, mask, reduction):
        """Reference ``NamedLoss._reduce`` semantics (NamedLoss.py:113-131):
        mean_per_frame = (sum over batch+time / total valid frames)
        .mean-over-features; mean_per_sample = (sum over time / sample
        length).mean over batch *and* features.  Both fall back to
        'mean' when no seq_mask is configured, as the reference does
        (length_dict lookup requires one)."""
        if reduction == "none":
            return per_elem
        if reduction == "sum":
            return jnp.sum(per_elem)
        if reduction in ("mean_per_frame", "mean_per_sample") \
                and mask is None:
            reduction = "mean"
        if reduction == "mean":
            if mask is None:
                return jnp.mean(per_elem)
            return jnp.sum(per_elem) / jnp.maximum(jnp.sum(mask), 1.0)
        if reduction == "mean_per_frame":
            # Mean over feature dim of (sum over batch+time / frames).
            frame_loss = jnp.mean(per_elem, axis=-1)
            frame_mask = jnp.max(mask, axis=-1)
            return jnp.sum(frame_loss) / jnp.maximum(
                jnp.sum(frame_mask), 1.0)
        if reduction == "mean_per_sample":
            # (sum over time / per-sample length), then mean over batch
            # and features.
            sample_loss = jnp.mean(
                jnp.sum(per_elem, axis=tuple(range(1, per_elem.ndim - 1))),
                axis=-1)
            sample_count = jnp.sum(
                jnp.max(mask, axis=-1), axis=tuple(range(1, mask.ndim - 1)))
            sample_loss = sample_loss / jnp.maximum(sample_count, 1.0)
            return jnp.mean(sample_loss)
        raise NotImplementedError(reduction)


@NamedLoss.register("MSELoss")
def _mse(pred, target, data_dict):
    return (pred - target) ** 2


@NamedLoss.register("L1Loss")
def _l1(pred, target, data_dict):
    return jnp.abs(pred - target)


@NamedLoss.register("CrossEntropyLoss")
def _ce(pred, target, data_dict):
    """pred: (..., C) logits; target: (...,) class ids or (..., 1)."""
    if target.ndim == pred.ndim:
        target = target[..., 0]
    log_probs = jax.nn.log_softmax(pred, axis=-1)
    picked = jnp.take_along_axis(
        log_probs, target.astype(jnp.int32)[..., None], axis=-1)
    return -picked


@NamedLoss.register("BCELoss")
def _bce(pred, target, data_dict, from_logits=False):
    if from_logits:
        pred = nn_sigmoid(pred)
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1 - eps)
    return -(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


def nn_sigmoid(x):
    return jax.nn.sigmoid(x)


@NamedLoss.register("WMSELoss")
def _wmse(pred, target, data_dict, weights=None, weight=1.0,
          weighted_indices=None, decision_index_weight=None):
    """MSE with per-feature-index weighting (WMSELoss.py role)."""
    err = (pred - target) ** 2
    if weights is not None:
        err = err * jnp.asarray(weights)
    elif weighted_indices is not None:
        w = np.ones(pred.shape[-1], np.float32)
        for idx in np.atleast_1d(weighted_indices):
            w[int(idx)] = weight
        err = err * jnp.asarray(w)
    return err


@NamedLoss.register("L1WeightedVUVMSELoss")
def _l1_weighted_vuv(pred, target, data_dict, weight_unvoiced=0.5,
                     vuv_index=1, decision_index_weight=1.0):
    """L1 on lf0 weighted by the VUV flag + MSE on the VUV decision
    (L1WeightedVUVMSELoss.py:13-34 role): pred/target are
    [lf0, vuv]."""
    lf0_err = jnp.abs(pred[..., :vuv_index] - target[..., :vuv_index])
    vuv_target = target[..., vuv_index:vuv_index + 1]
    # Weight lf0 error by voicedness of the target.
    lf0_err = lf0_err * (vuv_target + (1 - vuv_target) * weight_unvoiced)
    vuv_err = (pred[..., vuv_index:vuv_index + 1] - vuv_target) ** 2 \
        * decision_index_weight
    return jnp.concatenate([lf0_err, vuv_err], axis=-1)


@NamedLoss.register("WeightedNonzeroMSELoss")
def _weighted_nonzero_mse(pred, target, data_dict, weight_zero=0.1,
                          weight_non_zero=1.0):
    """Class-imbalance weighting for sparse spike targets
    (WeightedNonzeroMSELoss.py:15-107 role)."""
    err = (pred - target) ** 2
    is_nonzero = (jnp.abs(target) > 1e-8).astype(err.dtype)
    return err * (is_nonzero * weight_non_zero
                  + (1 - is_nonzero) * weight_zero)


@NamedLoss.register("VAEKLDLoss")
def _vae_kld(pred, target, data_dict, step=0, annealing_steps=0,
             annealing_start=0):
    """KLD of the VAE posterior against N(0, I); ``pred`` holds mu and
    ``target`` the name of logvar via the dict (VAEKLDLoss.py role,
    incl. the linear annealing schedule).  Expects dict entries
    ``vae_mu`` and ``vae_logvar``."""
    mu = jnp.asarray(data_dict["vae_mu"])
    logvar = jnp.asarray(data_dict["vae_logvar"])
    kld = -0.5 * (1 + logvar - mu ** 2 - jnp.exp(logvar))
    if annealing_steps:
        anneal = jnp.clip(
            (jnp.asarray(step, jnp.float32) - annealing_start)
            / float(annealing_steps), 0.0, 1.0)
        kld = kld * anneal
    return kld


@NamedLoss.register("OneHotCrossEntropyLoss")
def _one_hot_ce(pred, target, data_dict, shift=0):
    """CE with one-hot targets, optional target shift (WaveNet mu-law;
    OneHotCrossEntropyLoss.py:9-16 role)."""
    if shift:
        # Shift with zero padding, NOT roll: wrapped-around one-hots
        # would score the tail frames against the sequence start; an
        # all-zero one-hot contributes exactly zero CE instead.
        target = jnp.concatenate(
            [target[..., shift:, :],
             jnp.zeros_like(target[..., :shift, :])], axis=-2)
    log_probs = jax.nn.log_softmax(pred, axis=-1)
    return -jnp.sum(target * log_probs, axis=-1, keepdims=True)


@NamedLoss.register("DiscretizedMixtureLogisticLoss")
def _dmol(pred, target, data_dict, num_classes=256, log_scale_min=-7.0):
    """Mixture-of-logistics NLL for raw waveform modelling
    (DiscretizedMixturelogisticLoss.py:23-112 role).
    pred: (..., 3*K) [logit_probs, means, log_scales]; target in
    [-1, 1] (..., 1)."""
    K = pred.shape[-1] // 3
    logit_probs = pred[..., :K]
    means = pred[..., K:2 * K]
    log_scales = jnp.maximum(pred[..., 2 * K:], log_scale_min)
    t = jnp.broadcast_to(target, means.shape)
    inv_s = jnp.exp(-log_scales)
    half = 1.0 / (num_classes - 1)
    plus = jax.nn.sigmoid(inv_s * (t - means + half))
    minus = jax.nn.sigmoid(inv_s * (t - means - half))
    prob = jnp.clip(plus - minus, 1e-12, 1.0)
    log_prob = jnp.log(prob)
    # Edge cases.
    log_cdf_plus = jax.nn.log_sigmoid(inv_s * (t - means + half))
    log_one_minus_cdf = jax.nn.log_sigmoid(-inv_s * (t - means - half))
    log_prob = jnp.where(t < -0.999, log_cdf_plus,
                         jnp.where(t > 0.999, log_one_minus_cdf,
                                   log_prob))
    log_prob = log_prob + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jax.nn.logsumexp(log_prob, axis=-1, keepdims=True)


@NamedLoss.register("UnWeightedAccuracy")
def _unweighted_accuracy(pred, target, data_dict, num_classes=None):
    """Class-balanced error rate as a 'loss' (UnWeightedAccuracy.py
    role): mean over classes of per-class error rates.  Padded frames
    are excluded via the batch's "_seq_mask" when present.  Returns a
    constant per-element field — exact under every mean-family
    reduction (mean of a constant); use those, not "sum"."""
    if target.ndim == pred.ndim:
        target = target[..., 0]
    pred_cls = jnp.argmax(pred, axis=-1)
    valid = data_dict.get("_seq_mask")
    if valid is not None:
        valid = jnp.asarray(valid)[..., 0] > 0.5
        valid = jnp.broadcast_to(valid, target.shape)
    else:
        valid = jnp.ones(target.shape, bool)
    C = num_classes or pred.shape[-1]
    per_class_err = []
    for c in range(C):
        in_class = ((target == c) & valid).astype(jnp.float32)
        wrong = ((pred_cls != c) & (target == c)
                 & valid).astype(jnp.float32)
        per_class_err.append(jnp.sum(wrong)
                             / jnp.maximum(jnp.sum(in_class), 1.0))
    err = jnp.stack(per_class_err).mean()
    return jnp.broadcast_to(err, target.shape + (1,))


def _gamma_kernel(theta, k=6, frame_rate=200, length=100):
    t = np.arange(1, length + 1) / frame_rate
    g = t ** (k - 1) * np.exp(-t / theta) / (theta ** k *
                                             math_gamma(k))
    norm = np.linalg.norm(g)
    return (g / norm if norm > 0 else g).astype(np.float32)


def math_gamma(k):
    import math
    return math.gamma(k)


@NamedLoss.register("AtomLoss")
def _atom_loss(pred, target, data_dict, thetas=(0.03, 0.06, 0.09,
                                                0.12, 0.15), k=6,
               frame_rate=200, kernel_length=100):
    """Spike loss convolved with atom envelopes (AtomLoss.py:26-105
    role): spikes are smeared by their gamma kernels before the MSE, so
    small position errors cost little — reformulated as a causal
    depthwise convolution per theta track."""
    kernels = np.stack([_gamma_kernel(t, k, frame_rate, kernel_length)
                        for t in thetas])                # (Th, L)
    kern = jnp.asarray(kernels)[:, ::-1]
    L = kernel_length

    def envelope(x):
        # x: (B, T, Th) -> causal conv along T per channel.
        xt = jnp.moveaxis(x, -1, 1)                      # (B, Th, T)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (L - 1, 0)))
        out = jax.lax.conv_general_dilated(
            xt[:, :, None, :], kern[:, None, None, :],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=len(thetas))
        return jnp.moveaxis(out[:, :, 0, :], 1, -1)      # (B, T, Th)

    num_thetas = len(thetas)
    diff = envelope(pred[..., :num_thetas]) \
        - envelope(target[..., :num_thetas])
    return diff ** 2


@NamedLoss.register("WeightedNonzeroWMSEAtomLoss")
def _weighted_nonzero_wmse_atom(pred, target, data_dict,
                                weight_zero=0.1, weight_non_zero=1.0,
                                weight_vuv=1.0, vuv_index=-1):
    """Atom variant (WeightedNonzeroWMSEAtomLoss.py:52-68): sparse-spike
    weighting on the amplitude tracks plus a weighted VUV error on the
    flag column."""
    err = (pred - target) ** 2
    is_nonzero = (jnp.abs(target) > 1e-8).astype(err.dtype)
    spike_w = (is_nonzero * weight_non_zero
               + (1 - is_nonzero) * weight_zero)
    # The VUV flag column is a dense binary track: weight it by
    # weight_vuv ONLY (the sparse-spike weighting would down-weight
    # every unvoiced frame's classification error by weight_zero).
    is_vuv = jnp.zeros(pred.shape[-1]).at[vuv_index].set(1.0)
    weights = spike_w * (1.0 - is_vuv) + weight_vuv * is_vuv
    return err * weights
