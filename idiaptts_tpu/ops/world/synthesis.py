"""WORLD-style waveform synthesis: phase-coherent harmonics + shaped noise.

Fills the role of pyworld.synthesize (``WorldFeatLabelGen
.world_features_to_raw`` WorldFeatLabelGen.py:909-945).

TPU-first formulation: instead of WORLD's per-pitch-mark impulse
response overlap-add (irregular, data-dependent), the voiced part is an
additive harmonic model — per-sample phase accumulation ``phi_h[n] =
2*pi*h*cumsum(f0)/fs`` (one cumsum; phase-coherent across frames) with
harmonic amplitudes sampled from the spectral envelope (cepstral
expansion + Chebyshev cosine recurrence — no gathers, which dominate
TPU time otherwise) and linearly upsampled from frame to sample rate —
and the unvoiced part is white noise shaped by ``envelope *
aperiodicity`` via one batched STFT multiply + overlap-add.  Everything
is dense static-shape tensor work (FFTs, one cumsum, fused mul-adds)
that XLA fuses on device.

Amplitude calibration: for the analysis convention in
:mod:`cheaptrick` (unit-energy window, power smoothed over ``2 f0 / 3``)
a harmonic of envelope power ``E`` needs amplitude
``A_h = 2 * sqrt(E * f0 / (3 * fs))`` and the noise spectrum multiplier
is ``sqrt(E * win / 2)`` — derived in the docstring of the test
round-trip which asserts re-analysis recovers the envelope.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from idiaptts_tpu.ops import stft as stft_ops

# Degree-9 odd minimax polynomial for sin(pi*t) on [-1, 1]
# (max error 5.9e-6 = -104 dB, inaudible).  XLA's sin on TPU spends
# most of its time in range reduction we have already done (the phase
# is kept in cycles in [0, 1)), so a 5-term Horner chain is ~2x faster
# for the harmonic bank, which dominates synthesis time.
_SIN_C1 = 3.1415284229461573
_SIN_C3 = -5.166408786411196
_SIN_C5 = 2.5427382100290914
_SIN_C7 = -0.5818930905684506
_SIN_C9 = 0.06404115475945735


def _sin_cycles(x):
    """sin(2*pi*x) for x in [0, 1) via sin(pi*t), t = 2x-1 in [-1, 1):
    sin(2*pi*x) = -sin(pi*t)."""
    t = 2.0 * x - 1.0
    t2 = t * t
    p = _SIN_C9
    p = p * t2 + _SIN_C7
    p = p * t2 + _SIN_C5
    p = p * t2 + _SIN_C3
    p = p * t2 + _SIN_C1
    return -(t * p)


def _sample_log_field(log_field, x, num_ceps=64):
    """Evaluate a smooth log-spectral field at arbitrary frequencies
    WITHOUT gathers (TPU gathers dominate synthesis time otherwise:
    ~140 ms vs ~0 for the arithmetic at the bench batch size).

    log_field: (T, K) over bins [0, fs/2]; x: (T, H) frequency in
    cycles/sample in [0, 0.5].  Returns (T, H).

    Method: real cepstrum of the field (one irfft), then
    ``log_field(2*pi*x) = c0 + 2 * sum_m c_m cos(2*pi*m*x)`` evaluated
    with the Chebyshev recurrence ``cos((m+1)t) = 2cos(t)cos(mt) -
    cos((m-1)t)`` — one real cos total, the rest fused mul-adds.
    Exact for fields whose cepstrum dies within ``num_ceps`` terms
    (CheapTrick envelopes and band-interpolated aperiodicity are that
    smooth by construction)."""
    K = log_field.shape[1]
    n_fft = 2 * (K - 1)
    ceps = jnp.fft.irfft(log_field, n=n_fft, axis=1)[:, :num_ceps]
    theta = (2.0 * jnp.pi) * x
    cos1 = jnp.cos(theta)
    acc = ceps[:, 0:1] + 2.0 * ceps[:, 1:2] * cos1

    def body(m, carry):
        c_prev, c_cur, acc = carry
        c_next = 2.0 * cos1 * c_cur - c_prev
        w = jax.lax.dynamic_slice_in_dim(ceps, m, 1, axis=1)  # (T, 1)
        return (c_cur, c_next, acc + 2.0 * w * c_next)

    _, _, acc = jax.lax.fori_loop(
        2, num_ceps, body, (jnp.ones_like(cos1), cos1, acc))
    return acc


@partial(jax.jit, static_argnames=("fs", "hop", "max_harmonics"))
def _harmonic_part(f0, f0_cont, sp_power, ap, fs, hop, max_harmonics):
    """Additive harmonic synthesis.  f0 (T,) with unvoiced zeros,
    f0_cont (T,) gap-filled pitch for phase, sp_power (T, K),
    ap (T, K) -> (T * hop,) waveform."""
    T, num_bins = sp_power.shape
    n_fft = 2 * (num_bins - 1)
    bin_hz = fs / n_fft
    voiced = f0 > 0
    # f0_cont: continuous pitch for phase accumulation — holding the
    # last voiced value across gaps avoids broadband chirps at voicing
    # boundaries (amplitude alone ramps to zero there).
    f0_safe = f0_cont

    h = jnp.arange(1, max_harmonics + 1, dtype=jnp.float32)
    harm_freq = h[None, :] * f0_safe[:, None]          # (T, H)
    below_nyq = harm_freq < (fs / 2.0 - bin_hz)

    x = jnp.clip(harm_freq / fs, 0.0, 0.5)            # cycles/sample
    log_env = 0.5 * jnp.log(jnp.maximum(sp_power, 1e-30))   # log amp
    log_ap = jnp.log(jnp.maximum(ap, 1e-9))
    env_p = jnp.exp(2.0 * _sample_log_field(log_env, x))
    ap_h = jnp.exp(_sample_log_field(log_ap, x))
    periodic_frac = jnp.sqrt(jnp.clip(1.0 - ap_h ** 2, 0.0, 1.0))
    # Calibrated so cheaptrick re-analysis recovers sp_power (flat to
    # ±0.3 dB in the round-trip test).
    amp = 2.0 * jnp.sqrt(env_p * f0_safe[:, None] / fs)
    amp = amp * periodic_frac * below_nyq * voiced[:, None]

    # Per-sample upsampling via reshape (no gathers): sample n in frame
    # chunk t uses weights (1-k/hop, k/hop) against frames t, t+1.
    N = T * hop
    w = (jnp.arange(hop) / hop)                        # (hop,)
    f0_next = jnp.concatenate([f0_safe[1:], f0_safe[-1:]])
    f0_s = (f0_safe[:, None] * (1 - w)[None, :]
            + f0_next[:, None] * w[None, :]).reshape(N)
    # Phase accumulation in cycles, wrapped to [0, 1): sin(2*pi*h*Phi)
    # equals sin(2*pi*h*(Phi mod 1)) for integer h, and keeping the
    # argument small preserves f32 phase accuracy over long utterances
    # (raw phase reaches ~1e7 rad) and avoids slow range reduction.
    cycles = jnp.cumsum(f0_s) / fs
    cycles = jnp.mod(cycles, 1.0)                      # (N,)
    arg = jnp.mod(cycles[:, None] * h[None, :], 1.0)   # (N, H) in [0,1)

    amp_next = jnp.concatenate([amp[1:], amp[-1:]], axis=0)
    amp_s = (amp[:, None, :] * (1 - w)[None, :, None]
             + amp_next[:, None, :] * w[None, :, None]).reshape(N, -1)
    return jnp.sum(amp_s * _sin_cycles(arg), axis=1)


@partial(jax.jit, static_argnames=("fs", "hop"))
def _noise_part(f0, sp_power, ap, fs, hop, key):
    """Shaped-noise synthesis via one STFT multiply + overlap-add."""
    T, num_bins = sp_power.shape
    n_fft = 2 * (num_bins - 1)
    N = T * hop
    noise = jax.random.normal(key, (N,))
    # Short analysis window (zero-padded to n_fft bins) keeps the noise
    # energy local in time — a full-length window would smear quiet
    # frames with energy from loud neighbours through the overlap-add.
    win = min(n_fft, 4 * hop)
    spec = stft_ops.stft(noise, n_fft, hop, win_length=win)[:T]
    # White noise through a hann-windowed STFT: E|X|^2 = ||w||^2 * sigma^2
    # per bin; normalise to unit expected magnitude, then impose the
    # target amplitude sqrt(E * win / 2) * ap (the win/2 factor makes
    # re-analysis with the cheaptrick convention recover E — calibrated
    # by the round-trip test in tests/unit/test_world.py).
    wnorm = jnp.sqrt(jnp.sum(stft_ops.hann_window(win) ** 2))
    target = jnp.sqrt(jnp.maximum(sp_power, 0.0)) * ap
    shaped = spec / wnorm * target * jnp.sqrt(win / 2.0)
    return stft_ops.istft(shaped, n_fft, hop, win_length=win, length=N)


def world_synthesis(f0, sp_power, ap, fs, frame_shift_ms=5.0, seed=0):
    """Synthesise a waveform from WORLD-style features.

    f0: (T,) Hz with 0 = unvoiced; sp_power: (T, num_bins) power
    envelope (CheapTrick convention); ap: (T, num_bins) aperiodicity
    amplitude ratio in [0, 1].  Returns (T * hop,) float32 waveform.
    """
    from idiaptts_tpu.ops.interpolation import interpolate_lin
    hop = int(fs * frame_shift_ms / 1000.0)
    f0 = np.asarray(f0, np.float32).reshape(-1)
    f0_cont = interpolate_lin(f0)[0][:, 0]
    f0_cont = np.where(f0_cont > 0, f0_cont, 150.0)  # all-unvoiced guard
    f0 = jnp.asarray(f0)
    f0_cont = jnp.asarray(f0_cont, jnp.float32)
    sp_power = jnp.asarray(sp_power, jnp.float32)
    ap = jnp.asarray(ap, jnp.float32)
    max_harmonics = int(fs / 2.0 / 55.0)
    harm = _harmonic_part(f0, f0_cont, sp_power, ap, int(fs), hop,
                          max_harmonics)
    key = jax.random.PRNGKey(seed)
    noise = _noise_part(f0, sp_power, ap, int(fs), hop, key)
    return harm + noise
