import os

import numpy as np
import pytest

from idiaptts_tpu.data.normalisation import (
    MeanCovarianceExtractor, MeanStdDevExtractor, MinMaxExtractor)


def test_mean_std_dev_online(tmp_path):
    rng = np.random.RandomState(0)
    data = [rng.randn(50, 4) * 2 + 1, rng.randn(30, 4) * 2 + 1]
    ext = MeanStdDevExtractor()
    for d in data:
        ext.add_sample(d)
    mean, std = ext.get_params()
    all_data = np.concatenate(data)
    np.testing.assert_allclose(mean, all_data.mean(0), rtol=1e-10)
    np.testing.assert_allclose(std, all_data.std(0), rtol=1e-8)

    prefix = str(tmp_path / "feat")
    ext.save(prefix)
    m2, s2 = MeanStdDevExtractor.load(prefix + "-mean-std_dev.npz")
    np.testing.assert_allclose(m2, mean.astype(np.float32), rtol=1e-6)
    m3, s3 = MeanStdDevExtractor.load_mean_std_dev_from_stats(
        prefix + "-stats.npz")
    np.testing.assert_allclose(m3, mean.astype(np.float32), rtol=1e-6)


def test_mean_cov_online(tmp_path):
    rng = np.random.RandomState(1)
    data = [rng.randn(100, 3), rng.randn(60, 3)]
    ext = MeanCovarianceExtractor()
    for d in data:
        ext.add_sample(d)
    mean, cov = ext.get_params()
    all_data = np.concatenate(data)
    np.testing.assert_allclose(mean.squeeze(), all_data.mean(0), atol=1e-10)
    expected_cov = np.cov(all_data.T, bias=True)
    np.testing.assert_allclose(cov, expected_cov, atol=1e-8)
    prefix = str(tmp_path / "feat")
    ext.save(prefix)
    m2, c2 = MeanCovarianceExtractor.load(prefix + "-mean-covariance.npz")
    np.testing.assert_allclose(c2, cov.astype(np.float32), atol=1e-5)


def test_min_max(tmp_path):
    ext = MinMaxExtractor()
    ext.add_sample(np.array([[1.0, 5.0], [2.0, -1.0]]))
    ext.add_sample(np.array([[0.0, 10.0]]))
    vmin, vmax = ext.get_params()
    np.testing.assert_array_equal(vmin, [0.0, -1.0])
    np.testing.assert_array_equal(vmax, [2.0, 10.0])
    ext.save(str(tmp_path / "q"))
    m, M = MinMaxExtractor.load(str(tmp_path / "q-min-max.npz"))
    np.testing.assert_array_equal(np.squeeze(m), [0.0, -1.0])


def test_combine_stats(tmp_path):
    rng = np.random.RandomState(2)
    a, b = rng.randn(40, 2), rng.randn(25, 2)
    for name, d in [("a", a), ("b", b)]:
        ext = MeanStdDevExtractor()
        ext.add_sample(d)
        ext.save_stats(str(tmp_path / name))
    combined = MeanStdDevExtractor.combine_stats(
        [str(tmp_path / "a-stats.npz"), str(tmp_path / "b-stats.npz")])
    mean, std = combined.get_params()
    full = np.concatenate([a, b])
    np.testing.assert_allclose(mean, full.mean(0), rtol=1e-10)


def test_load_legacy_bin_fixtures(ref_fixtures_dir):
    """Reference-produced legacy .bin stat files load directly."""
    msd = os.path.join(ref_fixtures_dir, "WORLD", "mcep20",
                       "mean-std_dev.bin")
    mean, std = MeanStdDevExtractor.load(msd)
    assert mean.size == 20 and std.size == 20
    assert np.all(std > 0)
    cov_path = os.path.join(ref_fixtures_dir, "WORLD", "cmp_mcep20",
                            "mcep20-mean-covariance.bin")
    mean_c, cov = MeanCovarianceExtractor.load(cov_path)
    assert cov.shape == (60, 60)
    # Covariance diagonal must be positive; matrix symmetric.
    assert np.all(np.diag(cov) > 0)
    np.testing.assert_allclose(cov, cov.T, atol=1e-4)
