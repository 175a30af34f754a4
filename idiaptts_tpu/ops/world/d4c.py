"""Band aperiodicity estimation (D4C role) + WORLD-compatible coding.

Fills the role of pyworld's D4C + ``code_aperiodicity`` /
``decode_aperiodicity`` (``WorldFeatLabelGen.world_extract_features``
WorldFeatLabelGen.py:805, ``world_features_to_raw`` :940).

TPU-first formulation: instead of D4C's group-delay statistics we
estimate per-band aperiodicity as the fraction of spectral power that
sits between harmonics.  For each frame a pitch-synchronous window
(4 periods) gives a spectrum whose harmonic peaks are sampled by
interpolation at multiples of f0; inter-harmonic valleys are sampled at
(h + 0.5) f0.  The ratio valley/peak per 3 kHz band — the WORLD band
layout — is the aperiodicity ratio.  Coding matches pyworld's
observable convention on the fixtures: ``bap = ln(ap_ratio)`` clipped to
``ln(1e-9) ~ -20.72``; unvoiced frames are fully aperiodic (bap = 0).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_AP_FLOOR = 1e-9
_WINDOW_PERIODS = 6.0  # narrower mainlobes -> cleaner harmonic valleys
_CAL_A = 4.93          # log-domain affine calibration to D4C's scale
_CAL_B = -3.83         # (fit on the LJSpeech fixtures, see _d4c_jit)


def get_num_aperiodicities(fs):
    """Number of coded aperiodicity bands
    (AudioProcessing.py:71 via pyworld.get_num_aperiodicities):
    WORLD uses bands of 3 kHz starting at 3 kHz."""
    return int(min(15000.0, fs / 2.0 - 3000.0) / 3000.0)


_CORR_WIN = 512  # ~3 periods at 100 Hz / 16 kHz


@partial(jax.jit, static_argnames=("fs", "hop", "fft_size", "num_bands"))
def _d4c_jit(raw, f0, fs, hop, fft_size, num_bands):
    """Per-band aperiodicity via pitch-lag normalised autocorrelation.

    Each band-limited signal's correlation at the frame's own pitch lag
    measures the periodic power fraction r; aperiodicity = sqrt(1 - r).
    Unlike a harmonic/valley spectral measure this is insensitive to
    slow f0 drift inside the analysis window.
    """
    T = f0.shape[0]
    N = raw.shape[0]
    f0_eff = jnp.where(f0 > 0, jnp.maximum(f0, 50.0), 160.0)
    lag = jnp.round(fs / f0_eff).astype(jnp.int32)          # (T,)

    # Analytic band-limited signals via one full-signal FFT per band:
    # the MAGNITUDE of the complex pitch-lag correlation is insensitive
    # to sub-sample lag error, which would otherwise destroy HF
    # correlation (1 sample at 3 kHz = 1.2 rad of carrier phase).
    full = jnp.fft.fft(raw)
    freqs = jnp.fft.fftfreq(N, 1.0 / fs) * 1.0
    band_signals = []
    for b in range(num_bands):
        lo_f = 3000.0 * b + 1500.0
        hi_f = 3000.0 * b + 4500.0
        trans = 500.0
        mask = (jnp.clip((freqs - (lo_f - trans)) / trans, 0.0, 1.0)
                * jnp.clip(((hi_f + trans) - freqs) / trans, 0.0, 1.0))
        band_signals.append(jnp.fft.ifft(full * 2.0 * mask))  # analytic

    win = _CORR_WIN
    max_lag = 512
    lagc = jnp.minimum(lag, max_lag)

    # Gather-free framing: the frame starts lie on a regular hop grid,
    # so (T, ext) windows are a stack of shifted SLICES of the
    # hop-reshaped signal — large dynamic gathers dominate TPU time
    # otherwise (same lesson as the synthesis harmonic bank).
    rows_per_frame = -(-(win + max_lag + 2) // hop)          # ceil
    ext = rows_per_frame * hop                               # >= 1026
    nfft = int(2 ** np.ceil(np.log2(win + max_lag + 2 + win)))

    def frame_ext(z):
        zp = jnp.pad(z, (win // 2, ext + hop))
        rows = zp[:(T + rows_per_frame) * hop].reshape(-1, hop)
        return jnp.concatenate(
            [rows[i:i + T] for i in range(rows_per_frame)],
            axis=1)                                          # (T, ext)

    # Correlation against the frame's own pitch lag, evaluated from the
    # full FFT cross-correlation (three scalar lookups per frame instead
    # of three (T, win) dynamic gathers):
    #   c(L) = sum_n a[n] conj(z[n+L]) = conj(ifft(conj(fft(a)) fft(z)))
    lag3 = (lagc[:, None] + jnp.arange(-1, 2)[None, :])      # (T, 3)
    ap = []
    for z in band_signals:
        fr = frame_ext(z)                                    # (T, ext)
        a = fr[:, :win]
        e0 = jnp.sum(jnp.abs(a) ** 2, axis=1)
        A = jnp.fft.fft(a, n=nfft, axis=1)
        Z = jnp.fft.fft(fr, n=nfft, axis=1)
        corr = jnp.abs(jnp.fft.ifft(jnp.conj(A) * Z, axis=1))
        # Sliding lag-window energy from one prefix sum.
        prefix = jnp.cumsum(
            jnp.concatenate([jnp.zeros((T, 1)),
                             jnp.abs(fr) ** 2], axis=1), axis=1)
        num = jnp.take_along_axis(corr, lag3, axis=1)        # (T, 3)
        e1 = (jnp.take_along_axis(prefix, lag3 + win, axis=1)
              - jnp.take_along_axis(prefix, lag3, axis=1))
        r = num / jnp.sqrt(jnp.maximum(e0[:, None] * e1, 1e-20))
        # Max over the +-1 lag neighbourhood compensates the bulk
        # sub-sample period error (a full sample would cancel the sum).
        best_r = jnp.max(r, axis=1)
        ap.append(jnp.sqrt(jnp.clip(1.0 - best_r, _AP_FLOOR ** 2, 1.0)))
    ap = jnp.stack(ap, axis=1)                               # (T, bands)
    # Calibration to the WORLD/D4C scale: the pitch-lag correlation
    # measure compresses into ln-ap [-1.4, 0]; an affine map in the log
    # domain (fit against the reference's D4C tracks on the LJSpeech
    # fixtures) restores pyworld's observable range [-16, 0].
    ap = jnp.exp(jnp.clip(_CAL_A * jnp.log(ap) + _CAL_B,
                          np.log(_AP_FLOOR), 0.0))
    # Unvoiced frames: fully aperiodic.
    ap = jnp.where((f0 > 0)[:, None], ap, 1.0)
    return ap


def d4c_band_aperiodicity(raw, f0, fs, frame_shift_ms=5.0, fft_size=None):
    """Band aperiodicity amplitude ratios (T, num_bands) in (0, 1]."""
    from idiaptts_tpu.ops.mcep import fs_to_frame_length
    from idiaptts_tpu.ops.world.cheaptrick import _bucket_frames
    if fft_size is None:
        fft_size = fs_to_frame_length(fs)
    hop = int(fs * frame_shift_ms / 1000.0)
    num_bands = max(1, get_num_aperiodicities(fs))
    raw_p, f0_p, T = _bucket_frames(raw, f0, hop)
    out = _d4c_jit(jnp.asarray(raw_p), jnp.asarray(f0_p), int(fs), hop,
                   int(fft_size), num_bands)
    return out[:T]


def code_aperiodicity(ap_ratio):
    """(T, num_bands) ratio -> coded bap = ln(ratio) (pyworld coding as
    observed on the fixtures: range [ln(1e-9), 0])."""
    return jnp.log(jnp.clip(ap_ratio, _AP_FLOOR, 1.0))


def decode_aperiodicity(bap, num_bins, fs):
    """Coded bap (T, num_bands) -> full-resolution aperiodicity
    (T, num_bins) by piecewise-linear interpolation over band centres
    (pyworld.decode_aperiodicity role).  Like WORLD, the 0 Hz anchor is
    pinned at the aperiodicity floor — low frequencies of voiced speech
    stay periodic even when the coded bands are noisy — and the Nyquist
    anchor holds the last band's value."""
    bap = jnp.atleast_2d(bap)
    num_bands = bap.shape[-1]
    log_ratio = jnp.clip(bap, np.log(_AP_FLOOR), 0.0)
    anchors_f = jnp.concatenate([
        jnp.zeros(1), 3000.0 * (jnp.arange(num_bands) + 1.0),
        jnp.array([fs / 2.0])])
    anchors_v = jnp.concatenate([
        jnp.full(bap.shape[:-1] + (1,), np.log(_AP_FLOOR)),
        log_ratio, log_ratio[..., -1:]], axis=-1)
    freqs = jnp.linspace(0.0, fs / 2.0, num_bins)
    # Shared anchor grid -> vectorised piecewise-linear interpolation.
    seg = jnp.clip(jnp.searchsorted(anchors_f, freqs, side="right") - 1,
                   0, num_bands)                     # (num_bins,)
    f_lo = anchors_f[seg]
    f_hi = anchors_f[seg + 1]
    w = jnp.where(f_hi > f_lo, (freqs - f_lo) / jnp.maximum(
        f_hi - f_lo, 1e-9), 0.0)
    v_lo = anchors_v[..., seg]
    v_hi = anchors_v[..., seg + 1]
    ap_log = v_lo * (1.0 - w) + v_hi * w
    return jnp.clip(jnp.exp(ap_log), _AP_FLOOR, 1.0)
