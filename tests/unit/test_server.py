"""SynthesisServer: request batching over the fused pipeline."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline_and_params():
    import jax
    import jax.numpy as jnp

    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.synth.pipeline import FusedAcousticPipeline

    num_q, D = 30, 4  # tiny model; cmp = [sp 3D | lf0 3 | vuv | bap 3]
    cfg = convert_legacy_string(
        "RNNDYN-1_RELU_16-1_FC_{}".format(3 * D + 3 + 1 + 3), num_q)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred",)
    model = cfg.create_model()
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng},
        {"questions": jnp.ones((1, 8, num_q), jnp.float32)},
        lengths=jnp.array([8], jnp.int32), training=False)

    def model_apply(p, q, lengths):
        return model.apply(p, {"questions": q}, lengths=lengths,
                           training=False)["pred"]

    variances = {"sp": np.ones(3 * D, np.float32),
                 "lf0": np.ones(3, np.float32),
                 "bap": np.ones(3, np.float32)}
    pipeline = FusedAcousticPipeline(model_apply, variances,
                                     num_coded_sps=D, fs=16000,
                                     bucket=64)
    return pipeline, params, num_q


def test_server_batches_and_resolves(pipeline_and_params):
    from idiaptts_tpu.synth.server import SynthesisServer

    pipeline, params, num_q = pipeline_and_params
    server = SynthesisServer(pipeline, params, max_batch=8,
                             max_wait_ms=50.0)
    rng = np.random.RandomState(0)
    lengths = [20, 35, 50, 20, 35, 50]
    futures = [server.submit(rng.randn(T, num_q).astype(np.float32))
               for T in lengths]
    wavs = [f.result(timeout=120) for f in futures]
    hop = pipeline.hop
    for wav, T in zip(wavs, lengths):
        assert wav.shape == (T * hop,)
        assert np.isfinite(wav).all()
    stats = server.stats()
    assert stats["requests"] == len(lengths)
    # All requests fit one bucket -> batching actually grouped them.
    assert stats["mean_batch_occupancy"] > 1.0
    assert stats["audio_seconds"] > 0 and stats["x_realtime"] > 0
    server.shutdown()


def test_server_bucket_grouping_and_shutdown(pipeline_and_params):
    from idiaptts_tpu.synth.server import SynthesisServer

    pipeline, params, num_q = pipeline_and_params
    server = SynthesisServer(pipeline, params, max_batch=8,
                             max_wait_ms=50.0)
    rng = np.random.RandomState(1)
    # Two different buckets (bucket=64): 30 -> 64, 100 -> 128.
    futs = [server.submit(rng.randn(T, num_q).astype(np.float32))
            for T in (30, 100, 30, 100)]
    for f, T in zip(futs, (30, 100, 30, 100)):
        assert f.result(timeout=120).shape == (T * pipeline.hop,)
    assert server.stats()["batches"] >= 2  # one per bucket at least
    server.shutdown()
    with pytest.raises(RuntimeError):
        server.submit(np.zeros((10, num_q), np.float32))


def test_server_propagates_batch_failure(pipeline_and_params):
    from idiaptts_tpu.synth.server import SynthesisServer

    pipeline, params, num_q = pipeline_and_params

    class Broken:
        bucket = pipeline.bucket
        hop = pipeline.hop
        fs = pipeline.fs

        def __call__(self, params, questions):
            raise ValueError("boom")

    server = SynthesisServer(Broken(), params, max_wait_ms=5.0)
    fut = server.submit(np.zeros((10, num_q), np.float32))
    with pytest.raises(ValueError):
        fut.result(timeout=30)
    server.shutdown()


def test_server_over_sharded_pipeline():
    """SynthesisServer with a mesh-ed pipeline: batches whose padded
    size divides the 8-device data mesh shard over it transparently
    (FusedAcousticPipeline handles placement), and every caller still
    gets its own correct-length waveform."""
    import jax
    import jax.numpy as jnp

    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.parallel.mesh import make_data_mesh
    from idiaptts_tpu.synth.pipeline import FusedAcousticPipeline
    from idiaptts_tpu.synth.server import SynthesisServer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")

    num_q, D = 30, 4
    cfg = convert_legacy_string("RNNDYN-1_RELU_16-1_FC_19", num_q)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred",)
    model = cfg.create_model()
    params = model.init({"params": jax.random.PRNGKey(0)},
                        {"questions": jnp.ones((1, 8, num_q))},
                        lengths=jnp.array([8]), training=False)

    def apply_fn(p, q, lengths):
        return model.apply(p, {"questions": q}, lengths=lengths,
                           training=False)["pred"]

    variances = {"sp": np.ones(12, np.float32),
                 "lf0": np.ones(3, np.float32),
                 "bap": np.ones(3, np.float32)}
    pipeline = FusedAcousticPipeline(apply_fn, variances,
                                     num_coded_sps=D, fs=16000,
                                     bucket=64, mesh=make_data_mesh(8))
    server = SynthesisServer(pipeline, params, max_batch=8,
                             max_wait_ms=50.0)
    rng = np.random.RandomState(2)
    # 6 requests pad to 8 = the mesh size -> sharded dispatch.
    futs = [server.submit(rng.randn(40, num_q).astype(np.float32))
            for _ in range(6)]
    for f in futs:
        wav = f.result(timeout=120)
        assert wav.shape == (40 * pipeline.hop,)
        assert np.isfinite(wav).all()
    server.shutdown()
