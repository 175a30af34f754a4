import numpy as np


def test_sharded_serving_pipeline_matches_single_device():
    """FusedAcousticPipeline over an 8-device data mesh: the batch
    shards over chips, each synthesises its shard, outputs equal the
    unsharded run."""
    import jax
    import jax.numpy as jnp
    from idiaptts_tpu.parallel.mesh import make_data_mesh
    from idiaptts_tpu.synth.pipeline import FusedAcousticPipeline

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    D, NB, nq = 20, 1, 33
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(nq, 3 * (D + 1 + NB) + 1) * 0.01,
                    jnp.float32)

    def model_apply(params, q, lengths):
        return q @ params["W"]

    variances = {"sp": np.abs(rng.randn(3 * D)) + 0.1,
                 "lf0": np.abs(rng.randn(3)) + 0.1,
                 "bap": np.abs(rng.randn(3 * NB)) + 0.1}
    questions = [rng.randn(100 + 10 * i, nq).astype(np.float32)
                 for i in range(8)]
    params = {"W": W}

    plain = FusedAcousticPipeline(model_apply, variances,
                                  num_coded_sps=D, fs=16000)
    mesh = make_data_mesh(8)
    sharded = FusedAcousticPipeline(model_apply, variances,
                                    num_coded_sps=D, fs=16000,
                                    mesh=mesh)
    out_plain = plain(params, questions)
    out_sharded = sharded(params, questions)
    assert len(out_plain) == len(out_sharded) == 8
    for a, b in zip(out_plain, out_sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)
