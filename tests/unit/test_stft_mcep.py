import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from idiaptts_tpu.ops import mcep as mcep_ops
from idiaptts_tpu.ops import stft as stft_ops


def _tone(fs=16000, dur=0.3, freq=220.0):
    t = np.arange(int(fs * dur)) / fs
    return (0.6 * np.sin(2 * np.pi * freq * t)
            + 0.2 * np.sin(2 * np.pi * 3 * freq * t)).astype(np.float32)


def test_stft_matches_scipy():
    raw = _tone()
    n_fft, hop = 512, 128
    got = np.asarray(stft_ops.stft(jnp.asarray(raw), n_fft, hop))
    _, _, ref = scipy.signal.stft(raw, nperseg=n_fft, noverlap=n_fft - hop,
                                  window="hann", boundary=None, padded=False)
    # scipy normalises by window sum; compare magnitudes up to scale on
    # interior frames.
    interior = slice(4, min(got.shape[0], ref.shape[1]) - 4)
    g = np.abs(got[interior]).T
    r = np.abs(ref[:, interior])
    scale = np.sum(g * r) / np.sum(r * r)
    np.testing.assert_allclose(g, scale * r, atol=1e-2 * g.max())


def test_istft_roundtrip():
    raw = _tone()
    n_fft, hop = 512, 128
    spec = stft_ops.stft(jnp.asarray(raw), n_fft, hop)
    back = np.asarray(stft_ops.istft(spec, n_fft, hop, length=len(raw)))
    np.testing.assert_allclose(back[hop:-hop], raw[hop:-hop], atol=1e-3)


def test_mel_filterbank_properties():
    fb = stft_ops.mel_filterbank(16000, 512, n_mels=40)
    assert fb.shape == (40, 257)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)


def test_griffin_lim_reconstruction():
    raw = _tone(dur=0.25)
    n_fft, hop = 512, 128
    amp = jnp.abs(stft_ops.stft(jnp.asarray(raw), n_fft, hop))
    rec = np.asarray(stft_ops.griffin_lim(amp, n_fft, hop, num_iters=60,
                                          length=len(raw)))
    # Compare magnitude spectra of reconstruction (phase-free metric).
    amp_rec = np.abs(np.asarray(stft_ops.stft(jnp.asarray(rec), n_fft, hop)))
    err = np.linalg.norm(amp_rec - np.asarray(amp)) / np.linalg.norm(amp)
    assert err < 0.2


def test_mcep_alpha_table():
    assert mcep_ops.fs_to_mgc_alpha(16000) == pytest.approx(0.41, abs=0.02)
    assert mcep_ops.fs_to_mgc_alpha(22050) == pytest.approx(0.455, abs=0.02)
    assert mcep_ops.fs_to_mgc_alpha(48000) == pytest.approx(0.554, abs=0.03)


def test_fs_to_frame_length():
    assert mcep_ops.fs_to_frame_length(16000) == 1024
    assert mcep_ops.fs_to_frame_length(22050) == 1024
    assert mcep_ops.fs_to_frame_length(44100) == 2048
    assert mcep_ops.fs_to_frame_length(48000) == 2048


def test_mcep_roundtrip_smooth_spectrum():
    """analysis -> synthesis recovers a smooth log spectrum closely."""
    num_bins, order, alpha = 513, 24, 0.41
    omega = np.linspace(0, np.pi, num_bins)
    log_sp = (-2.0 + 1.5 * np.cos(omega * 2) + 0.5 * np.cos(omega * 5)
              - 0.8 * omega / np.pi)
    amp = np.exp(log_sp)[None, :].astype(np.float32)
    c = mcep_ops.amp_sp_to_mcep(jnp.asarray(amp), order, alpha)
    amp_rec = np.asarray(mcep_ops.mcep_to_amp_sp(c, num_bins, alpha))
    log_rec = np.log(amp_rec[0])
    rmse_db = np.sqrt(np.mean((log_rec - log_sp) ** 2)) * 20 / np.log(10)
    assert rmse_db < 1.0  # < 1 dB RMS error for a smooth envelope


def test_merlin_post_filter_preserves_energy():
    num_bins, order, alpha = 513, 24, 0.41
    rng = np.random.RandomState(0)
    mgc = rng.randn(5, order + 1).astype(np.float32) * 0.3
    mgc[:, 0] = -1.0
    post = mcep_ops.merlin_post_filter(jnp.asarray(mgc), alpha,
                                       num_bins=num_bins)
    sp_orig = np.asarray(mcep_ops.mcep_to_amp_sp(jnp.asarray(mgc), num_bins,
                                                 alpha))
    sp_post = np.asarray(mcep_ops.mcep_to_amp_sp(post, num_bins, alpha))
    e_orig = np.sum(sp_orig ** 2, axis=-1)
    e_post = np.sum(sp_post ** 2, axis=-1)
    np.testing.assert_allclose(e_post, e_orig, rtol=1e-3)
    # Higher-order coefficients are boosted.
    np.testing.assert_allclose(np.asarray(post)[:, 2:], mgc[:, 2:] * 1.4,
                               rtol=1e-5)


def test_min_phase_log_spectrum():
    """Min-phase spectrum has the same magnitude as the input."""
    num_bins = 257
    omega = np.linspace(0, np.pi, num_bins)
    log_amp = (-1.0 + np.cos(2 * omega))[None, :].astype(np.float32)
    cplx = np.asarray(mcep_ops.min_phase_log_spectrum(jnp.asarray(log_amp)))
    np.testing.assert_allclose(cplx.real[0], log_amp[0], atol=1e-3)
