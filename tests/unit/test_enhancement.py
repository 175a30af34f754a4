"""Speech enhancement equivalence evidence (the reference's MATLAB
spectral-subtraction pipeline role): measured SNR improvement on known
additive noise, late-reverb suppression on a known-T60 synthetic RIR,
and near-transparency on clean speech."""

import numpy as np

from idiaptts_tpu.ops.enhancement import enhance

FS = 16000


def _speechlike(dur=3.0, seed=0):
    """Amplitude-modulated harmonic signal (speech-like energy
    contour)."""
    rng = np.random.RandomState(seed)
    n = int(FS * dur)
    t = np.arange(n) / FS
    f0 = 130 + 25 * np.sin(2 * np.pi * 0.6 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.sin(h * phase + rng.rand() * 6.28) / h
              for h in range(1, 9))
    env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0.05, None)
    return (sig * env / np.abs(sig * env).max() * 0.7).astype(
        np.float32)


def _snr(clean, test):
    n = min(len(clean), len(test))
    clean, test = clean[:n], test[:n]
    # optimal scale to ignore fixed gain
    s = np.dot(test, clean) / np.dot(clean, clean)
    err = test - s * clean
    return 10 * np.log10(np.dot(clean, clean) * s ** 2
                         / max(np.dot(err, err), 1e-12))


def test_snr_improvement_on_additive_noise():
    clean = _speechlike()
    rng = np.random.RandomState(1)
    noise = rng.randn(len(clean)).astype(np.float32)
    noise *= np.sqrt((clean ** 2).mean() / (noise ** 2).mean()) \
        / 10 ** (5 / 20.0)                       # 5 dB input SNR
    noisy = clean + noise
    out = enhance(noisy, FS)
    snr_in = _snr(clean, noisy)
    snr_out = _snr(clean, out)
    assert snr_out > snr_in + 4.0, (snr_in, snr_out)


def test_clean_speech_is_nearly_transparent():
    clean = _speechlike(seed=2)
    out = enhance(clean, FS)
    assert _snr(clean, out) > 12.0, _snr(clean, out)


def test_dereverberation_suppresses_reverb_tail():
    """A burst followed by silence through a known-T60 RIR: the energy
    smeared into the silent region must drop by several dB while the
    direct-speech region is preserved (waveform SNR is meaningless for
    spectral dereverberation — phase stays reverberant — so energy in
    the known-silent tail is the honest observable)."""
    t60 = 0.6
    n = int(FS * 3.0)
    clean = np.zeros(n, np.float32)
    burst = _speechlike(dur=1.0, seed=3)
    clean[:len(burst)] = burst                     # speech then silence
    rng = np.random.RandomState(4)
    rir_len = int(FS * 0.4)
    t = np.arange(rir_len) / FS
    rir = rng.randn(rir_len) * np.exp(-3 * np.log(10) * t / t60)
    rir[0] = 4.0                                   # direct path
    rir /= np.abs(rir).sum() / 4.0
    reverberant = np.convolve(clean, rir)[:n].astype(np.float32)
    out = enhance(reverberant, FS, t60=t60)
    tail = slice(int(FS * 1.15), int(FS * 1.6))    # reverb-only region
    speech = slice(int(FS * 0.2), int(FS * 0.9))
    tail_drop_db = 10 * np.log10(
        (reverberant[tail] ** 2).mean()
        / max((out[tail] ** 2).mean(), 1e-12))
    speech_keep_db = 10 * np.log10(
        (out[speech] ** 2).mean()
        / (reverberant[speech] ** 2).mean())
    assert tail_drop_db > 3.0, tail_drop_db
    assert speech_keep_db > -3.0, speech_keep_db


def test_output_shape_and_finiteness():
    clean = _speechlike(dur=0.7, seed=5)
    out = enhance(clean, FS, t60=0.5)
    assert out.shape == clean.shape
    assert np.all(np.isfinite(out))
