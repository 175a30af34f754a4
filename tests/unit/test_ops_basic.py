import os

import jax.numpy as jnp
import numpy as np
import pytest

from idiaptts_tpu.ops import audio_io, interpolation, mulaw


def test_interpolate_lin_matches_loop_reference():
    """Vectorised interpolate_lin matches the reference loop semantics."""
    def reference_loop(data):
        data = np.reshape(np.copy(data), (data.size, 1))
        vuv = (data > 0.0).astype(float)
        ip = data
        T = data.size
        last = 0.0
        for i in range(T):
            if data[i] <= 0.0:
                j = i + 1
                for j in range(i + 1, T):
                    if data[j] > 0.0:
                        break
                if j < T - 1:
                    if last > 0.0:
                        step = (data[j] - data[i - 1]) / float(j - i)
                        for k in range(i, j):
                            ip[k] = data[i - 1] + step * (k - i + 1)
                    else:
                        for k in range(i, j):
                            ip[k] = data[j]
                else:
                    for k in range(i, T):
                        ip[k] = last
            else:
                ip[i] = data[i]
                last = data[i]
        return ip, vuv

    rng = np.random.RandomState(0)
    for _ in range(5):
        f0 = rng.rand(80) * 200 + 50
        f0[rng.rand(80) < 0.4] = 0.0
        ref, vuv_ref = reference_loop(f0.copy())
        got, vuv = interpolation.interpolate_lin(f0)
        np.testing.assert_allclose(got, ref, atol=1e-9)
        np.testing.assert_array_equal(vuv, vuv_ref)
    # all-unvoiced edge case
    got, vuv = interpolation.interpolate_lin(np.zeros(10))
    assert np.all(got == 0) and np.all(vuv == 0)


def test_compute_deltas_gradient():
    x = np.random.RandomState(1).randn(20, 3).astype(np.float32)
    np.testing.assert_allclose(interpolation.compute_deltas(x),
                               np.gradient(x, axis=0), atol=1e-6)
    jnp_d = np.asarray(interpolation.compute_deltas_jnp(jnp.asarray(x)))
    np.testing.assert_allclose(jnp_d, np.gradient(x, axis=0), atol=1e-5)


def test_add_deltas_shape():
    x = np.random.randn(15, 4)
    out = interpolation.add_deltas(x)
    assert out.shape == (15, 12)
    np.testing.assert_allclose(out[:, :4], x, atol=1e-6)


def test_sample_linearly():
    x = np.arange(5, dtype=np.float32)[:, None]
    out = interpolation.sample_linearly(x, 2)
    assert out.shape == (10, 1)
    np.testing.assert_allclose(out[:, 0][:4],
                               [0.0, 4.0 / 9.0, 8.0 / 9.0, 12.0 / 9.0],
                               atol=1e-5)


def test_mulaw_roundtrip():
    x = np.linspace(-0.99, 0.99, 101).astype(np.float32)
    y = mulaw.mulaw(x)
    back = mulaw.inv_mulaw(y)
    np.testing.assert_allclose(back, x, atol=1e-5)
    q = mulaw.mulaw_quantize(x)
    assert q.min() >= 0 and q.max() <= 255
    deq = mulaw.inv_mulaw_quantize(q)
    assert np.max(np.abs(deq - x)) < 0.05


def test_wav_roundtrip(tmp_path):
    fs = 16000
    t = np.arange(fs // 4) / fs
    raw = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = audio_io.raw_to_file(str(tmp_path / "a.wav"), raw, fs)
    back, fs2 = audio_io.get_raw(path)
    assert fs2 == fs
    np.testing.assert_allclose(back, raw, atol=1e-3)


def test_fixture_wav_loads(fixtures_dir, uid):
    wav = os.path.join(fixtures_dir, "database", "wav", uid + ".wav")
    raw, fs = audio_io.get_raw(wav)
    assert raw.ndim == 1 and len(raw) > fs  # > 1 second
    assert np.abs(raw).max() <= 1.0


def test_resample():
    fs = 16000
    t = np.arange(fs) / fs
    raw = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = audio_io.resample(raw, fs, 8000)
    assert abs(len(out) - fs // 2) <= 1


def test_trim_silence():
    fs = 16000
    sig = np.concatenate([np.zeros(fs // 2),
                          0.5 * np.ones(fs // 2),
                          np.zeros(fs // 2)]).astype(np.float32)
    trimmed, start, end = audio_io.trim_silence(sig, fs)
    assert abs(start - fs // 2) < fs // 50
    assert abs(end - fs) < fs // 50
