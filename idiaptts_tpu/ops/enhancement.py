"""Single-channel speech enhancement: spectral subtraction with
minimum-statistics noise tracking, decision-directed a-priori SNR and
late-reverberation suppression.

Role parity with the reference's MATLAB noise-reduction pipeline
(``scripts/noise_reduction/ProcessDereverbSpectralSubtract.m`` driven by
``single_channel_noise_reduction.py`` via a MATLAB engine): config 2 of
``selectConfig.m`` = minimum-statistics noise estimator
(``minimumStatistics2001.m``, Martin 2001), decision-directed /
cepstrally-smoothed a-priori SNR (``InitDereverbSpectralSubtract.m``:
``alpha_dd=0.98``, ``frame_length=32e-3``), a Wiener-family gain with a
minimum-gain floor (``minimum_gain=-10`` dB) and a Lebart-model late
reverberation estimate (``late_reverb_threshold=80e-3``, exponential
decay from T60).  This is a self-contained numpy implementation of the
same processing chain — no MATLAB runtime required.
"""

import numpy as np

_FRAME_S = 0.032
_ALPHA_DD = 0.98
_ALPHA_SMOOTH = 0.85      # periodogram smoothing for the min tracker
_MS_BUFFER_S = 3.0        # minimum-statistics window (selectConfig 2)
_MS_BIAS = 1.5            # Martin's minimum bias compensation (approx.)
_MIN_GAIN_DB = -10.0
_LATE_THRESHOLD_S = 0.08  # late-reverb onset (InitDereverb default)


def _stft(x, n_fft, hop):
    win = np.sqrt(np.hanning(n_fft + 1)[:n_fft])
    n_frames = 1 + max(0, -(-(len(x) - n_fft) // hop))
    pad = (n_frames - 1) * hop + n_fft
    xp = np.concatenate([x, np.zeros(max(0, pad - len(x)))])
    frames = np.stack([xp[i * hop:i * hop + n_fft] * win
                       for i in range(n_frames)])
    return np.fft.rfft(frames, axis=1), win


def _istft(spec, win, hop, length):
    frames = np.fft.irfft(spec, axis=1) * win[None, :]
    n_fft = win.shape[0]
    out = np.zeros((spec.shape[0] - 1) * hop + n_fft)
    norm = np.zeros_like(out)
    for i in range(spec.shape[0]):
        out[i * hop:i * hop + n_fft] += frames[i]
        norm[i * hop:i * hop + n_fft] += win ** 2
    out = out / np.maximum(norm, 1e-8)
    return out[:length]


def _minimum_statistics(periodogram, buffer_frames):
    """Noise PSD via tracked minima of the smoothed periodogram
    (minimumStatistics2001.m role, simplified fixed smoothing)."""
    T, F = periodogram.shape
    smoothed = np.empty_like(periodogram)
    acc = periodogram[0]
    for t in range(T):
        acc = _ALPHA_SMOOTH * acc + (1 - _ALPHA_SMOOTH) * periodogram[t]
        smoothed[t] = acc
    noise = np.empty_like(smoothed)
    for t in range(T):
        lo = max(0, t - buffer_frames + 1)
        noise[t] = smoothed[lo:t + 1].min(axis=0)
    return noise * _MS_BIAS


def enhance(noisy, fs, t60=None, minimum_gain_db=_MIN_GAIN_DB,
            dereverb=True):
    """Denoise (and optionally dereverberate) a waveform.

    Args:
      noisy: float waveform in [-1, 1].
      fs: sample rate.
      t60: reverberation time in seconds for the late-reverb model;
        ``None`` disables dereverberation (the reference's ``dT60=0``
        path where no estimate is available).
    Returns the enhanced waveform (same length).
    """
    noisy = np.asarray(noisy, np.float64)
    n_fft = int(2 ** np.round(np.log2(fs * _FRAME_S)))
    hop = n_fft // 2
    Y, win = _stft(noisy, n_fft, hop)
    P = np.abs(Y) ** 2
    buffer_frames = max(4, int(_MS_BUFFER_S * fs / hop))
    noise_psd = _minimum_statistics(P, buffer_frames)

    # Late-reverberation PSD (Lebart exponential-decay model):
    # sigma_r^2(t) = exp(-2*delta*T_l) * P(t - T_l), delta = 3ln10/T60.
    interference = noise_psd
    if dereverb and t60 and t60 > 0:
        delay = max(1, int(round(_LATE_THRESHOLD_S * fs / hop)))
        decay = np.exp(-2.0 * (3.0 * np.log(10.0) / t60)
                       * _LATE_THRESHOLD_S)
        late = np.zeros_like(P)
        late[delay:] = decay * P[:-delay]
        interference = interference + late

    # Decision-directed a-priori SNR + Wiener gain with a floor
    # (alpha_dd=0.98, minimum_gain dB; gain_function='betaorder' is a
    # Wiener-family gain).
    g_min = 10.0 ** (minimum_gain_db / 20.0)
    T = P.shape[0]
    gain = np.empty_like(P)
    prev_s2 = P[0]
    for t in range(T):
        sigma = np.maximum(interference[t], 1e-12)
        gamma = P[t] / sigma
        xi = (_ALPHA_DD * prev_s2 / sigma
              + (1 - _ALPHA_DD) * np.maximum(gamma - 1.0, 0.0))
        g = np.maximum(xi / (1.0 + xi), g_min)
        gain[t] = g
        prev_s2 = (g ** 2) * P[t]
    return _istft(Y * gain, win, hop, len(noisy)).astype(np.float32)
