"""Interpolation and delta-feature utilities.

Capability parity with the reference's ``idiaptts/misc/utils.py``
(``interpolate_lin`` :40-88, ``sample_linearly`` :89-101,
``compute_deltas`` :103-106, ``surround_with_norm_dist`` :108-150) —
reimplemented vectorised (numpy for host prep, jnp variants for on-device
use).  ``interpolate_lin`` keeps the reference's exact fill semantics
(leading zeros filled with first voiced value, trailing zeros with the last
voiced value, interior gaps linearly interpolated between the surrounding
voiced samples) so LF0 streams match to float precision.
"""

import numpy as np
import jax.numpy as jnp


def interpolate_lin(data):
    """Continuous f0/lf0 + vuv flag from an f0 track with unvoiced zeros.

    Vectorised equivalent of the reference's Merlin-derived loop,
    including its quirks: interior gaps between voiced frames at ``p`` and
    ``n`` use slope ``(x[n]-x[p])/(n-p-1)`` (so the sample just before
    ``n`` already equals ``x[n]``), a gap whose next voiced frame is the
    final frame is treated as a trailing gap (filled with the previous
    voiced value), and leading gaps are filled with the first voiced
    value.  Returns ``(ip_data, vuv)`` both of shape (T, 1) float.
    """
    data = np.reshape(np.copy(np.asarray(data, dtype=np.float64)), (-1, 1))
    T = data.shape[0]
    vuv = (data > 0.0).astype(np.float64)
    x = data[:, 0]
    voiced = x > 0.0
    if not voiced.any():
        return np.zeros_like(data), vuv
    idx = np.arange(T)
    # prev[k]: index of last voiced frame <= k (-1 if none).
    prev = np.where(voiced, idx, -1)
    prev = np.maximum.accumulate(prev)
    # nxt[k]: index of first voiced frame >= k (T if none).
    nxt = np.where(voiced, idx, T)
    nxt = np.minimum.accumulate(nxt[::-1])[::-1]

    ip = x.copy()
    gap = ~voiced
    p, n = prev[gap], nxt[gap]
    k = idx[gap]
    xp = np.where(p >= 0, x[np.clip(p, 0, T - 1)], 0.0)
    xn = np.where(n < T, x[np.clip(n, 0, T - 1)], 0.0)
    interior = n <= T - 2  # next voiced frame exists and is not the last
    denom = np.maximum(n - p - 1, 1).astype(np.float64)
    interp_val = xp + (xn - xp) * (k - p) / denom
    lead_val = xn  # no previous voiced value: fill with next
    trail_val = np.where(p >= 0, xp, 0.0)  # gap reaches (or ends at) T-1
    val = np.where(interior, np.where(p >= 0, interp_val, lead_val),
                   trail_val)
    ip[gap] = val
    # Reference quirk: a trailing gap whose next voiced frame is exactly
    # the final frame overwrites that final frame too (the fill loop runs
    # to T; utils.py:79-80).
    if T >= 2 and voiced[T - 1] and not voiced[T - 2]:
        p_last = prev[T - 2]
        ip[T - 1] = x[p_last] if p_last >= 0 else 0.0
    return ip.reshape(-1, 1), vuv


def sample_linearly(sample, in_to_out_multiplier, dtype=np.float32):
    """Upsample along axis 0 by linear interpolation.

    Matches reference ``sample_linearly`` (utils.py:89-101): output length is
    ``int(multiplier) * len(sample)`` with query points linspaced over
    [0, len-1].
    """
    if in_to_out_multiplier == 1:
        return sample
    if in_to_out_multiplier < 1:
        raise NotImplementedError("Down-sampling is not supported.")
    sample = np.asarray(sample)
    T = len(sample)
    x_new = np.linspace(0.0, T - 1, num=int(in_to_out_multiplier) * T)
    lo = np.floor(x_new).astype(np.int64)
    hi = np.minimum(lo + 1, T - 1)
    frac = (x_new - lo).reshape((-1,) + (1,) * (sample.ndim - 1))
    out = sample[lo] * (1.0 - frac) + sample[hi] * frac
    return out.astype(dtype)


def compute_deltas(labels):
    """First-order deltas as central differences (reference uses
    ``np.gradient``, utils.py:103-106; MLPG windows must stay consistent
    with this: (-0.5, 0, 0.5) interior, one-sided at the edges)."""
    return np.gradient(np.asarray(labels), axis=0).astype(np.float32)


def compute_deltas_jnp(labels):
    """On-device equivalent of :func:`compute_deltas` for (T, D) arrays."""
    upper = jnp.concatenate([labels[1:2], labels[2:], labels[-1:]], axis=0)
    lower = jnp.concatenate([labels[:1], labels[:-2], labels[-2:-1]], axis=0)
    deltas = (upper - lower) * 0.5
    # Edge rows use one-sided differences (gradient semantics).
    deltas = deltas.at[0].set(labels[1] - labels[0])
    deltas = deltas.at[-1].set(labels[-1] - labels[-2])
    return deltas


def add_deltas(features):
    """Stack [x, Δx, ΔΔx] along the feature axis for a (T, D) array."""
    features = np.asarray(features)
    if features.ndim == 1:
        features = features[:, None]
    d1 = compute_deltas(features)
    d2 = compute_deltas(d1)
    return np.concatenate([features, d1, d2], axis=-1).astype(np.float32)


def surround_with_norm_dist(label, window_size=5, std_dev=1.0, mean=0.0,
                            threshold=0.2):
    """Surround each atom row with a normal-distribution bump scaled by
    the atom's (signed) row values — exact utils.py:108-150 semantics:
    the window spans ±threshold_x (where the pdf falls to ``threshold``
    of its peak), atoms are located by column 0, and overlapping bumps
    SUM (signed), matching the reference's outer-product accumulation."""
    import math as _math
    if window_size % 2 == 0:
        window_size += 1
    half = window_size // 2
    threshold_x = abs(mean + _math.sqrt(
        -_math.log(threshold) * 2.0 * std_dev ** 2 - mean ** 2))
    x = np.linspace(-threshold_x, threshold_x, window_size)
    coefs = np.exp(-0.5 * ((x - mean) / std_dev) ** 2)
    coefs /= np.exp(-0.5 * ((mean - mean) / std_dev) ** 2)

    label = np.asarray(label, dtype=np.float64)
    squeeze = label.ndim == 1
    if squeeze:
        label = label[:, None]
    out = np.zeros_like(label)
    (atoms_pos,) = np.nonzero(label[:, 0] != 0)
    for pos in atoms_pos:
        start = pos - half
        dist_start, dist_end = 0, window_size
        if start < 0:
            dist_start = -start
            start = 0
        end = pos + half
        if end >= len(label):
            dist_end = window_size - (end - len(label) + 1)
            end = len(label) - 1
        out[start:end + 1] += np.outer(coefs[dist_start:dist_end],
                                       label[pos])
    out = out.astype(np.float32)
    return out[:, 0] if squeeze else out
