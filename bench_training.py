"""Secondary benchmark: acoustic-model TRAINING throughput per chip.

BASELINE.md asks for acoustic frames/sec (training + inference)
"measured and reported per chip".  ``bench.py`` is the driver-run
headline (label->wav inference xRT); this module reports the training
side: full jit train step (forward, masked MSE, grads, adam update) of
the Interspeech'18 baseline acoustic architecture on bucketed LJSpeech
fixture shapes.  The measurement bodies are plain functions returning
dicts so ``bench.py`` can embed them in the driver-captured headline
JSON; ``main`` prints one JSON line per metric for standalone use.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_PEAK_TFLOPS = 197.0      # v5e bf16 peak


def _setup_jax_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


def training_numbers(B=8, T=1024, runs=10, remat=None,
                     train_profile=False, bf16_residuals=True):
    """Train + inference frames/s and MFU for the Interspeech'18
    acoustic architecture at batch ``B``, bucket ``T``.

    ``remat`` (default: on for B >= 64 without ``train_profile``):
    rematerialise the BiLSTM groups' activations in the backward pass.
    At B >= 64 the scan path's saved f32 residuals (x_proj alone is
    (2, B, T, 4F) ~= 2 GB at B=64) thrash HBM and OOM at B=128; remat
    trades those saves for recompute FLOPs, which the otherwise-idle
    MXU rows absorb.

    ``train_profile``: trace the train step under
    ``pallas_ctx.train_profile`` — train-viability kernel dispatch
    (fused kernels stay live up to B=64) with bf16 residual streams."""
    import contextlib

    import jax
    import jax.numpy as jnp
    import optax

    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.ops import pallas_ctx

    _setup_jax_cache()
    D_in, D_out = 409, 67
    cfg = convert_legacy_string(
        "RNNDYN-2_RELU_1024-3_BiLSTM_512-1_FC_{}".format(D_out), D_in)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred",)
    if remat is None:
        remat = B >= 64 and not train_profile
    if remat:
        for layer in cfg.layer_configs:
            if "LSTM" in layer.layer_type:
                layer.extra["remat"] = True
    model = cfg.create_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D_in),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(B, T, D_out),
                    jnp.float32)
    mask = jnp.ones((B, T, 1))
    lengths = jnp.full((B,), T, jnp.int32)
    params = model.init({"params": rng}, {"questions": x[:1]},
                        lengths=lengths[:1], training=True)
    optimiser = optax.adam(1e-3)
    opt_state = optimiser.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y, mask, lengths):
        def loss_fn(p):
            out = model.apply(p, {"questions": x}, lengths=lengths,
                              training=False)["pred"]
            return jnp.sum(((out - y) ** 2) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimiser.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # The profile flags are trace-time: wrap only the compiling call.
    ctx = (pallas_ctx.train_profile(bf16_residuals=bf16_residuals)
           if train_profile else contextlib.nullcontext())
    with ctx:
        params, opt_state, loss = train_step(params, opt_state, x, y,
                                             mask, lengths)
    float(loss)
    # Steady-state timing: training steps chain through the params
    # dependency, so dispatching them back-to-back and syncing ONCE
    # measures pure step time.  A per-step scalar fetch pays the
    # tunnel's ~30 ms host round trip every iteration — an environment
    # artifact; real training loops fetch the loss every N steps.
    t0 = time.time()
    for _ in range(runs):
        params, opt_state, loss = train_step(params, opt_state, x, y,
                                             mask, lengths)
    float(loss)
    train_elapsed = (time.time() - t0) / runs
    train_fps = B * T / train_elapsed

    # Inference steps are serialised through a scalar carry (0*acc
    # touches the input) so back-to-back dispatches cannot stall the
    # tunneled queue, and ONE final sync closes the chain.
    @jax.jit
    def infer_chained(params, x, lengths, acc):
        out = model.apply(params, {"questions": x + 0.0 * acc},
                          lengths=lengths, training=False)["pred"]
        return jnp.sum(out)

    acc = infer_chained(params, x, lengths, jnp.float32(0.0))
    float(acc)
    t0 = time.time()
    for _ in range(runs):
        acc = infer_chained(params, x, lengths, acc)
    float(acc)
    infer_elapsed = (time.time() - t0) / runs
    infer_fps = B * T / infer_elapsed

    # Analytic model matmul FLOPs per frame for the benchmark
    # architecture (2_RELU_1024-3_BiLSTM_512-1_FC_67, D_in=409):
    # dense layers 2*D_in*D_out; BiLSTM layers, per direction,
    # projection 2*D*4F + recurrence 2*F*4F.  Training = 3x forward
    # (dL/dx and dL/dW each cost one forward-sized matmul set).
    F = 512
    fwd_flops_per_frame = (
        2 * (D_in * 1024 + 1024 * 1024)              # RELU stack
        + 3 * 2 * (2 * 1024 * 4 * F + 2 * F * 4 * F)  # 3 BiLSTMs
        + 2 * 1024 * D_out)                           # FC head
    train_tflops = 3 * fwd_flops_per_frame * train_fps / 1e12
    infer_tflops = fwd_flops_per_frame * infer_fps / 1e12
    return {
        "batch": B, "bucket_T": T,
        "train_profile": bool(train_profile),
        "train_frames_per_s": round(train_fps),
        "train_tflops_per_s": round(train_tflops, 2),
        "train_mfu_vs_197tf_peak": round(train_tflops / _PEAK_TFLOPS, 3),
        "infer_frames_per_s": round(infer_fps),
        "infer_tflops_per_s": round(infer_tflops, 2),
        "infer_mfu_vs_197tf_peak": round(infer_tflops / _PEAK_TFLOPS, 3),
    }


def wavenet_numbers(batches=(16, 64, 256), seconds=1.0, runs=3):
    """Autoregressive WaveNet generation throughput through the public
    ``generate()`` at several batch sizes; aggregate xRT =
    B*seconds/elapsed.  B=16 runs the fused Pallas sampler (VMEM caps
    the kernel's ring buffers at B<=16 for the production
    architecture); larger batches run the jit scan whose per-step cost
    grows sub-linearly (41 us at B=64 -> 66 us at B=256, measured), so
    aggregate throughput keeps climbing — batched serving is the
    >=200x path.  Two numbers per batch: ``gen`` = generation complete
    on device (scalar-fetch sync; consumers like trainer.synth keep
    the waveform on device for fused PCM16 encode), ``serve`` = incl.
    the int16 waveform device->host fetch (the wav-file surface; on
    the tunneled bench link this transfer is ~40 MB/s, on a direct
    PCIe host it is negligible)."""
    import jax
    import jax.numpy as jnp

    from idiaptts_tpu.models.wavenet import (WaveNet, WaveNetWrapper,
                                             generate)

    _setup_jax_cache()
    cfg = WaveNetWrapper.Config(input_names=("cond",),
                                output_names=("logits",))
    net = WaveNet(out_channels=cfg.out_channels,
                  residual_channels=cfg.residual_channels,
                  gate_channels=cfg.gate_channels,
                  skip_channels=cfg.skip_channels,
                  num_layers=cfg.num_layers, num_stacks=cfg.num_stacks)
    T, C = int(16000 * seconds), 63
    results = {}
    best = None
    params = None
    encode = jax.jit(lambda w: (jnp.clip(w, -1.0, 1.0)
                                * 32767.0).astype(jnp.int16))
    # One base utterance tiled on DEVICE: AR sampling cost does not
    # depend on conditioning values, and h2d of a (256, T, C) float32
    # batch is ~1 GB over the tunneled link — the tile keeps the
    # transfer at one utterance.
    base = jnp.asarray(np.random.RandomState(0)
                       .randn(1, T, C).astype(np.float32) * 0.1)
    for B in batches:
        cond = jnp.tile(base, (B, 1, 1))
        if params is None:
            params = {"params": {"wavenet": net.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((B, T), jnp.int32), cond)["params"]}}
        w = generate(params, cfg, cond, rng=jax.random.PRNGKey(1),
                     device_output=True)          # warmup/compile
        np.asarray(encode(w))
        # Median per-run samples: one tunnel-load hiccup (observed to
        # inflate a sample several-fold) must not sink the batch's
        # number the way a mean would.
        gens, serves = [], []
        for i in range(runs):
            t0 = time.time()
            w = generate(params, cfg, cond,
                         rng=jax.random.PRNGKey(2 + i),
                         device_output=True)
            float(jnp.sum(w))                     # device-side sync
            t1 = time.time()
            np.asarray(encode(w))                 # int16 d2h
            t2 = time.time()
            gens.append(t1 - t0)
            serves.append(t2 - t0)
        gen = round(B * T / 16000.0 / float(np.median(gens)), 1)
        serve = round(B * T / 16000.0 / float(np.median(serves)), 1)
        results["xrt_B{}".format(B)] = gen
        results["serve_xrt_B{}".format(B)] = serve
        if best is None or gen > best[1]:
            best = (B, gen, serve)
    results["best_batch"] = best[0]
    results["best_xrt"] = best[1]
    results["best_serve_xrt"] = best[2]

    # Pipelined serving at the best batch: dispatch the NEXT batch's
    # generation before fetching the previous batch's int16 waveform,
    # so the device->host transfer rides under the device's compute
    # (dispatch is async; np.asarray on the previous result forces its
    # transfer while the new batch executes).  This is how a real
    # serving loop behaves — the serial serve number above pays the
    # transfer on the critical path.
    Bb = best[0]
    cond = jnp.tile(base, (Bb, 1, 1))
    n_pipe = 3
    prev = generate(params, cfg, cond, rng=jax.random.PRNGKey(9),
                    device_output=True)
    np.asarray(encode(prev))                      # warm
    t0 = time.time()
    prev = generate(params, cfg, cond, rng=jax.random.PRNGKey(10),
                    device_output=True)
    for i in range(1, n_pipe):
        nxt = generate(params, cfg, cond,
                       rng=jax.random.PRNGKey(10 + i),
                       device_output=True)
        np.asarray(encode(prev))
        prev = nxt
    np.asarray(encode(prev))
    elapsed = time.time() - t0
    results["pipelined_serve_xrt"] = round(
        n_pipe * Bb * T / 16000.0 / elapsed, 1)
    return results


def ref_surface_numbers(runs=3):
    """trainer.synth through the reference-surface API (fused
    model+MLPG+vocoder jit + wav file writing) on the fixture corpus.
    Unlike the headline this includes the device->host waveform
    transfer and PCM16 encoding — the number a user of trainer.synth
    sees.  Prefers the reference's LJSpeech fixture corpus (the same
    9 utterances / ~58 s the headline measures — representative
    utterance lengths); falls back to the repo-local corpus (6 short
    clips, ~10 s, where fixed per-call round trips dominate the
    xRT)."""
    from idiaptts_tpu.data.questions import QuestionSet
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.ops.audio_io import get_raw
    from idiaptts_tpu.train.acoustic import AcousticModelTrainer

    _setup_jax_cache()
    ref_fixtures = "/root/reference/test/integration/fixtures"
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tests", "fixtures")
    if os.path.isdir(ref_fixtures):
        fixtures = ref_fixtures
        ids = ["LJ001-000{}".format(i) for i in range(1, 10)]
        num_questions = 409
    elif os.path.isdir(local):
        fixtures = local
        num_questions = QuestionSet(os.path.join(
            local, "questions-gen_dnn.hed")).dict_size + 9
        with open(os.path.join(local, "file_id_list.txt")) as f:
            ids = [line.strip() for line in f if line.strip()]
    else:
        return None
    hparams = AcousticModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.num_coded_sps = 20
    hparams.out_dir = "/tmp/bench_ref_surface"
    hparams.model_name = "bench"
    hparams.epochs = 0
    hparams.seed = 1
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.25
    hparams.use_best_as_final_model = False
    hparams.synth_fs = 16000
    hparams.synth_dir = "/tmp/bench_ref_surface/wavs"
    trainer = AcousticModelTrainer(
        hparams, ids,
        dir_question_labels=os.path.join(fixtures, "questions"),
        dir_world_features=os.path.join(fixtures, "WORLD"))
    cfg = convert_legacy_string(
        "RNNDYN-2_RELU_1024-3_BiLSTM_512-1_FC_67", num_questions)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred_acoustic_features",)
    trainer.init(hparams, model_config=cfg)

    paths = trainer.synth(hparams, ids)      # warmup / compile
    # Median of per-run samples: a single tunnel-load hiccup (multi-
    # hundred-ms round-trip jitter was observed) must not halve the
    # reported number the way a mean would.
    samples = []
    for _ in range(max(runs, 5)):
        t0 = time.time()
        paths = trainer.synth(hparams, ids)
        samples.append(time.time() - t0)
    elapsed = float(np.median(samples))
    audio_seconds = sum(len(get_raw(p)[0]) / 16000.0
                        for p in paths.values())
    return {"synth_xrt": round(audio_seconds / elapsed, 2),
            "audio_seconds": round(audio_seconds, 2),
            "n_utterances": len(ids)}


def main():
    for B in (8, 32):
        r = training_numbers(B=B)
        print(json.dumps({"metric": "acoustic training throughput",
                          "value": r["train_frames_per_s"],
                          "unit": "frames/sec per chip",
                          "vs_baseline": None, "detail": r}))
    w = wavenet_numbers()
    print(json.dumps({"metric": "wavenet vocoder sampling",
                      "value": w["best_xrt"],
                      "unit": "x realtime per chip (aggregate, 16kHz)",
                      "vs_baseline": round(w["best_xrt"] / 200.0, 3),
                      "detail": w}))
    r = ref_surface_numbers()
    if r is not None:
        print(json.dumps({"metric": "reference-surface synth throughput",
                          "value": r["synth_xrt"],
                          "unit": "x realtime per chip (incl. wav IO)",
                          "vs_baseline": round(r["synth_xrt"] / 200.0, 3),
                          "detail": r}))


if __name__ == "__main__":
    main()
