"""Headline benchmark: LJSpeech label->waveform synthesis throughput.

Measures the full TPU inference path on the committed fixture corpus
(repo-local tests/fixtures; falls back to the reference mount):
question labels -> biLSTM acoustic model (Interspeech'18 baseline size)
-> denormalisation -> MLPG trajectory smoothing -> mcep decode -> WORLD
harmonic+noise synthesis.  Prints ONE JSON line:
``{"metric": ..., "value": xRT, "unit": "x realtime/chip",
"vs_baseline": value / 200}`` (north-star: >200x real time per chip,
BASELINE.md).

Hardened against the tunneled TPU's transient failures (round 4's
run died at warmup on one ``remote_compile: read body`` error and
scored nothing): the measurement runs in a WORKER subprocess that
writes each stage's result to its own JSON file as soon as it
completes, device calls retry in-process on transient runtime errors,
and the parent retries the whole worker (compilation cache makes
re-runs cheap) until the headline stage exists or the attempt budget
is spent.  Optional stages (per-stage breakdown, capacity, training,
WaveNet, reference-surface synth) can fail without zeroing the run —
they are merged into the headline line's ``detail`` when present.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_LOCAL_FIXTURES = os.path.join(_REPO, "tests", "fixtures")
_REF_FIXTURES = "/root/reference/test/integration/fixtures"
FS = 16000
NUM_SPS = 20

# Stage files live here across worker attempts.
_STAGE_NAMES = ("headline", "breakdown", "capacity", "training",
                "training_large", "wavenet", "ref_surface")
_REQUIRED = "headline"

_TRANSIENT_MARKERS = (
    "remote_compile", "read body", "response body closed", "INTERNAL",
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "Connection reset",
    "Socket closed", "EOF", "tunnel",
)


def _is_transient(exc):
    msg = "{}: {}".format(type(exc).__name__, exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _retry(fn, attempts=3, base_sleep=3.0):
    """Run ``fn`` retrying transient tunnel/runtime errors in-process."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classified below
            if i == attempts - 1 or not _is_transient(e):
                raise
            sys.stderr.write("bench: transient error (attempt %d): %s\n"
                             % (i + 1, e))
            time.sleep(base_sleep * (i + 1))


# ---------------------------------------------------------------------------
# Worker: measures stages, writing each result file as it completes.
# ---------------------------------------------------------------------------

def _stage_path(stage_dir, name):
    return os.path.join(stage_dir, name + ".json")


def _write_stage(stage_dir, name, payload):
    tmp = _stage_path(stage_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _stage_path(stage_dir, name))


def _read_stage(stage_dir, name):
    path = _stage_path(stage_dir, name)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _corpus():
    """(fixtures_dir, id_list, num_questions, stats_prefix).

    Prefers the reference fixture set (longer utterances, keeps the
    headline number comparable across rounds); falls back to the
    repo-local corpus so the benchmark also runs self-contained."""
    if os.path.isdir(_REF_FIXTURES):
        ids = ["LJ001-000{}".format(i) for i in range(1, 10)]
        return _REF_FIXTURES, ids, 409, ""
    if os.path.isdir(_LOCAL_FIXTURES):
        with open(os.path.join(_LOCAL_FIXTURES, "file_id_list.txt")) as f:
            ids = [line.strip() for line in f if line.strip()]
        from idiaptts_tpu.data.questions import QuestionSet
        num_q = QuestionSet(os.path.join(
            _LOCAL_FIXTURES, "questions-gen_dnn.hed")).dict_size + 9
        return _LOCAL_FIXTURES, ids, num_q, ""
    raise RuntimeError("no fixture corpus found; run "
                       "tools/create_fixtures.py")


def _load_inputs(fixtures, ids, num_questions):
    from idiaptts_tpu.data.questions import QuestionLabelGen

    questions = {}
    for id_name in ids:
        questions[id_name] = QuestionLabelGen.load_sample(
            id_name, os.path.join(fixtures, "questions"),
            num_questions=num_questions)
    return questions


def _worker(stage_dir):
    import jax

    # Persistent compilation cache: the tunneled TPU's compile service
    # can be slow/overloaded; caching the compiled pipeline across
    # processes keeps the benchmark measuring the chip, not the
    # compiler (measured 2x faster cold-start on a degraded tunnel) —
    # and makes parent-level worker retries cheap.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from idiaptts_tpu.data.normalisation import MeanCovarianceExtractor
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.synth.pipeline import FusedAcousticPipeline

    fixtures, ids, num_questions, stats_prefix = _corpus()
    questions = _load_inputs(fixtures, ids, num_questions)

    # Model: Interspeech'18 baseline acoustic architecture.
    cfg = convert_legacy_string(
        "RNNDYN-2_RELU_1024-3_BiLSTM_512-1_FC_67", num_questions)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred",)
    model = cfg.create_model()

    # MLPG variances from the fixture stats (reference-produced).
    def diag(name):
        base = os.path.join(fixtures, "WORLD", "cmp_mcep20",
                            stats_prefix + name + "-mean-covariance")
        path = base + (".npz" if os.path.isfile(base + ".npz")
                       else ".bin")
        _, cov = MeanCovarianceExtractor.load(path)
        return np.ascontiguousarray(np.diagonal(cov))

    variances = {"sp": diag("mcep20"), "lf0": diag("lf0"),
                 "bap": diag("bap")}

    # Pad all utterances to one bucket for a single compiled program.
    max_T = max(len(q) for q in questions.values())
    bucket = int(np.ceil(max_T / 256) * 256)
    batch = np.zeros((len(ids), bucket, num_questions), np.float32)
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

    def model_apply(params, questions_b, lengths_b):
        return model.apply(params, {"questions": questions_b},
                           lengths=lengths_b, training=False)["pred"]

    pipeline = FusedAcousticPipeline(model_apply, variances,
                                     num_coded_sps=NUM_SPS, fs=FS)

    # Upload the inputs once (production keeps them device-resident;
    # the tunnel's ~40 MB/s would otherwise dominate the measurement).
    batch = jnp.asarray(batch)
    lengths = jnp.asarray(lengths)

    # Timing: enqueue ``depth`` executions back-to-back and sync once
    # (a scalar d2h forces completion; block_until_ready under-reports
    # on the tunneled platform).  Throughput measurement must pipeline
    # dispatch: the tunnel costs ~30 ms per host->device round trip
    # (measured: a trivial kernel "takes" 33 ms synced-per-call, 4 ms
    # pipelined), which is relay latency, not chip time — production
    # serving keeps the device queue full exactly like this.  Median
    # over groups: the tunnel adds multi-ms jitter that a mean would
    # fold into the headline (the r1->r2 "9% regression" was exactly
    # this noise).  The full-waveform d2h transfer is excluded because
    # the tunnel's ~40 MB/s is an artifact of this environment.
    def timed(fn, runs=5, depth=8):
        def sync(out):
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        _retry(lambda: sync(fn()))
        samples = []
        for _ in range(runs):
            t0 = time.time()
            outs = [fn() for _ in range(depth)]
            sync(outs[-1])
            samples.append((time.time() - t0) / depth)
        return float(np.median(samples))

    B, T = int(batch.shape[0]), int(batch.shape[1])
    audio_seconds = float(np.asarray(lengths).sum()) * 0.005

    # -- stage: headline -------------------------------------------------
    if _read_stage(stage_dir, "headline") is None:
        _retry(lambda: float(jnp.sum(pipeline(
            params, batch, lengths, device_output=True))))  # warmup
        elapsed = timed(lambda: pipeline(params, batch, lengths,
                                         device_output=True))
        xrt = audio_seconds / elapsed
        _write_stage(stage_dir, "headline", {
            "xrt": round(xrt, 2),
            "total_ms": round(elapsed * 1e3, 2),
            "frames_per_s": int(float(np.asarray(lengths).sum())
                                / elapsed),
            "audio_seconds": round(audio_seconds, 2),
            "batch": B, "bucket_T": T, "runs": 5,
            "timing": "median of pipelined groups (depth 8)",
        })

    # -- stage: per-stage breakdown ---------------------------------------
    def breakdown():
        model_j, mlpg_j, vocoder_j = pipeline.stage_jits()
        factors, tau = pipeline._factors_for(T)
        f0_cont = pipeline._default_f0_cont(B, T)
        key = jax.random.PRNGKey(0)
        out = model_j(params, batch, lengths)
        smoothed, vuv = mlpg_j(out, lengths, factors, tau)
        _retry(lambda: float(jnp.sum(
            vocoder_j(smoothed, vuv, f0_cont, key))))  # warmup
        t_model = timed(lambda: model_j(params, batch, lengths))
        t_mlpg = timed(lambda: mlpg_j(out, lengths, factors, tau))
        t_vocoder = timed(lambda: vocoder_j(smoothed, vuv, f0_cont, key))
        # Roofline view of the dominant stage: matmul FLOPs of the
        # Interspeech'18 model on the padded bucket (2 FF 1024 +
        # 3 BiLSTM 512 + FC 67; gate matmuls = 2*4*h*(in+h) MACs/dir).
        h, ff = 512, 1024
        flops_frame = (2 * (num_questions * ff + ff * ff)     # FF stack
                       + 3 * 2 * 2 * 4 * h * (ff + h)         # BiLSTMs
                       + 2 * ff * 67)                         # FC out
        return {"model_ms": round(t_model * 1e3, 2),
                "mlpg_ms": round(t_mlpg * 1e3, 2),
                "vocoder_ms": round(t_vocoder * 1e3, 2),
                "model_tflops_per_s":
                    round(flops_frame * B * T / t_model / 1e12, 2)}

    # -- stage: serving capacity ------------------------------------------
    def capacity():
        # The headline batch (9 fixture utterances) leaves the MXU
        # skinny (18 rows vs 128-row tiles); a production server
        # batches more.  Same pipeline at 8x batch = capacity xRT.
        rep = 8
        batch_cap = jnp.asarray(np.tile(np.asarray(batch), (rep, 1, 1)))
        lengths_cap = jnp.asarray(np.tile(np.asarray(lengths), rep))
        _retry(lambda: float(jnp.sum(pipeline(
            params, batch_cap, lengths_cap, device_output=True))))
        cap_elapsed = timed(
            lambda: pipeline(params, batch_cap, lengths_cap,
                             device_output=True), runs=3)
        return {"capacity_xrt_batch{}".format(B * rep):
                round(float(np.asarray(lengths_cap).sum()) * 0.005
                      / cap_elapsed, 1)}

    # -- optional stages (failures recorded, never fatal) ------------------
    def run_optional(name, fn):
        if _read_stage(stage_dir, name) is not None:
            return
        try:
            result = _retry(fn, attempts=2)
        except Exception as e:  # noqa: BLE001 - stage is optional
            sys.stderr.write("bench: stage %s failed: %s\n" % (name, e))
            return
        if result is not None:
            _write_stage(stage_dir, name, result)

    run_optional("breakdown", breakdown)
    run_optional("capacity", capacity)

    import bench_training
    run_optional("training",
                 lambda: {"B8": bench_training.training_numbers(B=8),
                          "B32": bench_training.training_numbers(B=32)})
    run_optional("wavenet", lambda: bench_training.wavenet_numbers())
    run_optional("ref_surface",
                 lambda: bench_training.ref_surface_numbers())
    # LAST and in its own stage (slow first compile must not take any
    # other stage with it).  B=64 under the round-5 train profile —
    # the handler's production configuration at this batch: fused
    # kernels stay live to the full 128-row MXU tile with bf16
    # residual streams (62.3 TF/s / 31.6% MFU measured, vs the
    # round-4 scan fallback's 37.1 TF/s; B=128 OOMs 21 GB / 15.75 GB).
    # See docs/PERFORMANCE.md for the full configuration matrix.
    run_optional("training_large",
                 lambda: {"B64": bench_training.training_numbers(
                     B=64, T=2048, remat=False, train_profile=True)})


# ---------------------------------------------------------------------------
# Orchestrator: bounded worker retries, merged single-line output.
# ---------------------------------------------------------------------------

def _merge_and_print(stage_dir):
    headline = _read_stage(stage_dir, "headline")
    if headline is None:
        print(json.dumps({
            "metric": "LJSpeech label->wav synthesis throughput",
            "value": None, "unit": "x realtime per chip",
            "vs_baseline": None,
            "detail": {"error": "headline stage never completed"}}))
        return 1
    detail = dict(headline)
    xrt = detail.pop("xrt")
    for name in ("breakdown", "capacity"):
        extra = _read_stage(stage_dir, name)
        if extra:
            detail.update(extra)
    for name in ("training", "wavenet", "ref_surface"):
        extra = _read_stage(stage_dir, name)
        if extra:
            detail[name] = extra
    large = _read_stage(stage_dir, "training_large")
    if large:
        detail.setdefault("training", {}).update(large)
    print(json.dumps({
        "metric": "LJSpeech label->wav synthesis throughput",
        "value": xrt,
        "unit": "x realtime per chip",
        "vs_baseline": round(xrt / 200.0, 3),
        "detail": detail,
    }))
    return 0


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        _worker(sys.argv[2])
        return 0

    stage_dir = os.environ.get("BENCH_STAGE_DIR")
    if not stage_dir:
        import tempfile
        stage_dir = tempfile.mkdtemp(prefix="bench_stages_")
    os.makedirs(stage_dir, exist_ok=True)

    deadline = time.time() + float(os.environ.get("BENCH_BUDGET_S",
                                                  2100))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", 3))
    for attempt in range(attempts):
        budget = deadline - time.time()
        if budget < 120 and _read_stage(stage_dir, _REQUIRED):
            break
        if budget <= 60:
            break
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 stage_dir],
                timeout=min(1500.0, budget), stdout=sys.stderr,
                check=False)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -1
            sys.stderr.write("bench: worker attempt %d timed out\n"
                             % (attempt + 1))
        done = all(_read_stage(stage_dir, n) is not None
                   for n in _STAGE_NAMES)
        if rc == 0 and _read_stage(stage_dir, _REQUIRED) is not None:
            break
        if done:
            break
        sys.stderr.write("bench: worker attempt %d rc=%s; retrying\n"
                         % (attempt + 1, rc))
        time.sleep(5)
    return _merge_and_print(stage_dir)


if __name__ == "__main__":
    sys.exit(main())
