"""Mel-cepstral analysis and synthesis as batched matmuls.

Replaces the reference's SPTK calls (``AudioProcessing.py``:
``extract_mcep`` :142-153 / ``extract_mgc`` :123-140 via ``pysptk.mcep`` /
``mgcep``, ``mcep_to_amp_sp``/``mgc_to_amp_sp`` :248-275 via
``pysptk.mgc2sp``, ``fs_to_mgc_alpha`` :33 via ``pysptk.mcepalpha``, and
nnmnkwii's ``merlin_post_filter`` :19,310).

TPU-native design: with the all-pass warp
``beta(w) = w + 2*atan(alpha*sin(w) / (1 - alpha*cos(w)))`` the mel
log-amplitude model is ``log|H(w)| = sum_m c_m cos(m*beta(w))`` — a linear
map between cepstra and log spectra.  Both directions become single
matmuls with precomputed warped-cosine bases (MXU work, batched over
frames), instead of SPTK's per-frame Newton iterations.  For smooth
CheapTrick-style envelopes the least-squares projection matches SPTK's
UELS solution closely; parity is asserted to tolerance in tests.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def mcep_alpha(fs):
    """Best all-pass warping coefficient for a sample rate: grid search
    minimising RMS distance between the warped scale and the mel scale
    (pysptk.mcepalpha behaviour)."""
    alphas = np.arange(0.0, 1.0, 0.001)
    num = 1000
    omega = np.arange(1, num + 1) / num * np.pi
    nyq = fs / 2.0
    freq = omega / np.pi * nyq
    mel = np.log1p(freq / 1000.0 * 10.0 / 10.0)  # ln(1 + f/1000)
    mel = mel / mel[-1] * np.pi
    best_alpha, best_dist = 0.0, np.inf
    for alpha in alphas:
        warped = omega + 2.0 * np.arctan2(alpha * np.sin(omega),
                                          1.0 - alpha * np.cos(omega))
        dist = np.sqrt(np.mean((warped - mel) ** 2))
        if dist < best_dist:
            best_alpha, best_dist = alpha, dist
    return round(best_alpha, 3)


@lru_cache(maxsize=None)
def fs_to_mgc_alpha(fs):
    """Known SPTK values for common rates; grid search otherwise
    (AudioProcessing.fs_to_mgc_alpha parity)."""
    table = {8000: 0.312, 11025: 0.357, 16000: 0.41, 22050: 0.455,
             44100: 0.544, 48000: 0.554}
    return table.get(int(fs), mcep_alpha(fs))


def fs_to_frame_length(fs):
    """CheapTrick FFT size for a sample rate
    (AudioProcessing.fs_to_frame_length :53, pyworld
    get_cheaptrick_fft_size with default f0_floor=71):
    2 ** ceil(log2(3 * fs / f0_floor + 1))."""
    f0_floor = 71.0
    return int(2 ** np.ceil(np.log2(3.0 * fs / f0_floor + 1.0)))


def warp_frequency(omega, alpha):
    return omega + 2.0 * np.arctan2(alpha * np.sin(omega),
                                    1.0 - alpha * np.cos(omega))


@lru_cache(maxsize=None)
def _bases(num_bins, order, alpha):
    """Precompute (analysis pinv, synthesis basis) for a bin count /
    cepstral order / warp coefficient.

    synthesis A: (num_bins, order+1) with A[k, m] = cos(m * beta(w_k));
    analysis:    pinv(A) (order+1, num_bins) — least-squares projection.
    """
    omega = np.linspace(0, np.pi, num_bins)
    beta = warp_frequency(omega, alpha)
    m = np.arange(order + 1)
    A = np.cos(beta[:, None] * m[None, :])
    pinv = np.linalg.pinv(A)
    # Return numpy so the cache is trace-safe; jit folds them to constants.
    return pinv.astype(np.float32), A.astype(np.float32)


def _mm(x, B):
    """Basis matmul at full f32: the cepstrum<->spectrum transforms are
    quality-critical (MCD-level), and the TPU default single-pass bf16
    matmul costs ~0.7% relative error on the reconstructed spectra
    (enough to break the post filter's 1e-3 energy-preservation
    contract).  These matmuls are a negligible slice of synthesis
    time."""
    return jnp.matmul(x, B, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("order", "alpha"))
def amp_sp_to_mcep_ls(amp_sp, order, alpha):
    """Log-domain least-squares mel-cepstral projection (cepstral
    smoothing).  Cheap single matmul; used as the Newton init."""
    pinv, _ = _bases(amp_sp.shape[-1], order, alpha)
    log_sp = jnp.log(jnp.maximum(amp_sp, 1e-10))
    return _mm(log_sp, pinv.T)


@partial(jax.jit, static_argnames=("order", "alpha", "num_iters"))
def amp_sp_to_mcep(amp_sp, order, alpha, num_iters=32):
    """Batched mel-cepstral analysis from amplitude spectra with SPTK's
    UELS criterion (``pysptk.mcep(x, order, alpha, itype=3)`` role).

    Minimises ``eps = mean(exp(R) - R - 1)`` with
    ``R = log I - 2 * c @ A^T`` (I = power spectrum) by quasi-Newton
    iterations with the FIXED Hessian at the optimum (w = 1), i.e. a
    preconditioned gradient method: per iteration only two (T, K)@(K, M)
    matmuls, no per-frame Hessian assembly or batched 21x21 solves
    (those cost ~90 ms/utterance on TPU vs ~0 for this formulation;
    32 cheap iterations land within 0.06 mcep units max / 0.001 mean of
    the exact damped-Newton solution on real CheapTrick spectra).
    The asymmetric criterion fits spectral peaks tightly like SPTK,
    unlike the symmetric log-LS projection used for the init.
    """
    num_bins = amp_sp.shape[-1]
    _, A_np = _bases(num_bins, order, alpha)       # (K, M) numpy
    A = jnp.asarray(A_np)
    H0_inv = jnp.asarray(np.linalg.inv(
        4.0 * (A_np.T @ A_np) / num_bins
        + np.eye(order + 1) * 1e-4))
    log_I = 2.0 * jnp.log(jnp.maximum(amp_sp, 1e-10))   # power, natural log
    c = amp_sp_to_mcep_ls(amp_sp, order, alpha)

    def body(_, c):
        R = log_I - 2.0 * _mm(c, A.T)               # (..., K)
        w = jnp.exp(jnp.clip(R, -30.0, 30.0))
        g = -2.0 * _mm(w - 1.0, A) / num_bins       # (..., M)
        delta = jnp.clip(-_mm(g, H0_inv), -1.0, 1.0)
        return c + delta

    return jax.lax.fori_loop(0, num_iters, body, c)


@partial(jax.jit, static_argnames=("num_bins", "alpha"))
def mcep_to_amp_sp(mcep, num_bins, alpha):
    """Batched mel-cepstrum -> amplitude spectrum (pysptk.mgc2sp role,
    AudioProcessing.mcep_to_amp_sp :248-275)."""
    order = mcep.shape[-1] - 1
    _, A = _bases(num_bins, order, alpha)
    # Clip before exp: real speech log amplitudes stay within ~[-30,
    # 15]; the ceiling only binds for divergent model outputs, where an
    # f32 inf would propagate to NaN through the synthesis masks.
    return jnp.exp(jnp.clip(_mm(mcep, A.T), -60.0, 25.0))


@partial(jax.jit, static_argnames=("num_bins", "alpha"))
def mcep_to_log_amp_sp(mcep, num_bins, alpha):
    order = mcep.shape[-1] - 1
    _, A = _bases(num_bins, order, alpha)
    return _mm(mcep, A.T)


@partial(jax.jit, static_argnames=("alpha", "coef", "num_bins"))
def merlin_post_filter(mgc, alpha, coef=1.4, num_bins=513):
    """Formant-emphasis post filter with energy preservation
    (nnmnkwii merlin_post_filter semantics): boost c_2.. by ``coef``then
    correct c_0 so total spectral energy is unchanged."""
    order = mgc.shape[-1] - 1
    _, A = _bases(num_bins, order, alpha)
    weights = jnp.ones(order + 1).at[2:].set(coef)
    mgc_p = mgc * weights
    e_orig = jnp.sum(jnp.exp(2.0 * _mm(mgc, A.T)), axis=-1)
    e_post = jnp.sum(jnp.exp(2.0 * _mm(mgc_p, A.T)), axis=-1)
    c0_corr = 0.5 * jnp.log(e_orig / jnp.maximum(e_post, 1e-20))
    return mgc_p.at[..., 0].add(c0_corr)


def min_phase_log_spectrum(log_amp):
    """Minimum-phase complex log spectrum from a real log-amplitude
    spectrum via the cepstral method (used by WORLD-style synthesis):
    zero the anti-causal cepstrum, double the causal part."""
    num_bins = log_amp.shape[-1]
    n_fft = 2 * (num_bins - 1)
    cep = jnp.fft.irfft(log_amp, n=n_fft, axis=-1)
    lifter = jnp.concatenate([
        jnp.ones(1), 2.0 * jnp.ones(n_fft // 2 - 1), jnp.ones(1),
        jnp.zeros(n_fft // 2 - 1)])
    return jnp.fft.rfft(cep * lifter, n=n_fft, axis=-1)
