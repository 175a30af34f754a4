"""Gated reference-parity benchmark.

The reference CI pins its acoustic benchmark to 3 decimals
(`test/integration/model_trainers/test_AcousticModelTrainer.py:104` —
MCD 8.616 dB / F0-RMSE 78.4 Hz / VDE 0.609 / BAP 37.352 dB) and its
duration benchmark (`test_DurationModelTrainer.py:106` — RMSE 14.954
frames).  This module locks the "matches or beats the reference"
claim in CI: it runs the seeded ljspeech recipe end-to-end on the
*reference's* fixture set (wav + HTS labels + its 400-question .hed),
then scores the predictions against the *reference's own*
pyworld/pysptk-extracted ground-truth WORLD features with identical
metric definitions, and asserts every metric is <= the reference's
pinned value.  Any kernel/model/metric change that costs quality
relative to the reference turns this red.

Skips when the read-only reference mount is absent (the rest of the
suite is self-contained on the committed fixture corpus).
"""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.phonemes import PhonemeDurationLabelGen
from idiaptts_tpu.data.questions import QuestionLabelGen, QuestionSet
from idiaptts_tpu.train.acoustic import AcousticModelTrainer
from idiaptts_tpu.train.duration import DurationModelTrainer

# The reference's pinned benchmark values (its own CI regression pins).
REF_ACOUSTIC_PINS = {"mcd": 8.616, "f0_rmse": 78.4, "vde": 0.609,
                     "bap": 37.352}
REF_DURATION_RMSE_PIN = 14.954

# Our recorded margins on the recording platform (virtual CPU,
# 2026-08-20).  Pinning these — not just the reference caps — stops
# parity from silently eroding while still clearing the caps: each
# metric must stay within the margin of its recorded value, so a
# change that costs (say) 5% MCD turns CI red even though the
# reference pin is far away.  The seeded recipes reproduce these to
# <0.1% on the recording platform (same tier as the quality pins'
# RTOL=0.01, test_quality_pins.py), so the margin is 1%.
RECORDED_ACOUSTIC = {"mcd": 6.310, "f0_rmse": 53.75, "vde": 0.150,
                     "bap": 25.366}
RECORDED_DURATION_RMSE = 6.758
MARGIN_RTOL = 0.01

NUM_SPS = 20
EPOCHS = 16


@pytest.fixture(scope="module")
def ref_ids(ref_fixtures_dir):
    with open(os.path.join(ref_fixtures_dir, "database",
                           "file_id_list.txt")) as f:
        return [line.strip().split("/")[-1] for line in f if line.strip()]


@pytest.fixture(scope="module")
def ref_question_file(ref_fixtures_dir):
    return os.path.join(ref_fixtures_dir, "questions-en-radio_dnn_400.hed")


@pytest.fixture(scope="module")
def ref_num_questions(ref_question_file):
    return QuestionSet(ref_question_file).dict_size + 9


@pytest.fixture(scope="module")
def workdir(ref_fixtures_dir, ref_ids, ref_question_file,
            tmp_path_factory):
    """Linguistic features on the reference corpus with THIS
    framework's extractors (question matching, durations)."""
    work = tmp_path_factory.mktemp("ref_parity")
    label_dir = os.path.join(ref_fixtures_dir, "labels",
                             "label_state_align")
    QuestionLabelGen.gen_data(
        label_dir, ref_question_file,
        dir_out=os.path.join(str(work), "questions"), id_list=ref_ids)
    PhonemeDurationLabelGen.gen_data(
        label_dir, dir_out=os.path.join(str(work), "dur"),
        id_list=ref_ids)
    return str(work)


def _train_acoustic(workdir, world_dir, ref_ids, ref_num_questions,
                    out_dir):
    hparams = AcousticModelTrainer.create_hparams()
    hparams.num_questions = ref_num_questions
    hparams.num_coded_sps = NUM_SPS
    hparams.out_dir = out_dir
    hparams.model_name = "ref_parity_acoustic"
    hparams.epochs = EPOCHS
    hparams.batch_size_train = 2
    hparams.batch_size_val = 9
    hparams.batch_size_benchmark = 9
    hparams.learning_rate = 0.002
    hparams.seed = 1
    hparams.use_best_as_final_model = True
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.25
    hparams.synth_fs = 16000
    trainer = AcousticModelTrainer(
        hparams, list(ref_ids),
        dir_question_labels=os.path.join(workdir, "questions"),
        dir_world_features=world_dir)
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    cfg = convert_legacy_string("RNNDYN-2_RELU_128-1_BiLSTM_64-1_FC_67",
                                ref_num_questions)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred_acoustic_features",)
    trainer.init(hparams, model_config=cfg)
    trainer.train(hparams)
    return trainer, hparams


def test_acoustic_beats_reference_pins(ref_fixtures_dir, workdir, ref_ids,
                                       ref_num_questions, tmp_path):
    # The reference's exact benchmark setup: train on the fixture set's
    # precomputed pyworld/pysptk WORLD features and score against the
    # same ground truth (test_AcousticModelTrainer.py:66-104 trains and
    # benchmarks on the fixture WORLD dir) — so any difference from the
    # pins is attributable to the model/training/MLPG/metrics stack.
    trainer, hparams = _train_acoustic(
        workdir, os.path.join(ref_fixtures_dir, "WORLD"), ref_ids,
        ref_num_questions, str(tmp_path))
    mcd, f0_rmse, vde, bap = trainer.benchmark(hparams, list(ref_ids))
    print("reference-parity acoustic benchmark: MCD %.3f dB (pin %.3f), "
          "F0-RMSE %.2f Hz (pin %.1f), VDE %.3f (pin %.3f), BAP %.3f dB "
          "(pin %.3f)" % (mcd, REF_ACOUSTIC_PINS["mcd"], f0_rmse,
                          REF_ACOUSTIC_PINS["f0_rmse"], vde,
                          REF_ACOUSTIC_PINS["vde"], bap,
                          REF_ACOUSTIC_PINS["bap"]))
    assert mcd <= REF_ACOUSTIC_PINS["mcd"], \
        "MCD %.3f worse than reference pin %.3f" % (
            mcd, REF_ACOUSTIC_PINS["mcd"])
    assert f0_rmse <= REF_ACOUSTIC_PINS["f0_rmse"], \
        "F0-RMSE %.2f worse than reference pin %.1f" % (
            f0_rmse, REF_ACOUSTIC_PINS["f0_rmse"])
    assert vde <= REF_ACOUSTIC_PINS["vde"], \
        "VDE %.3f worse than reference pin %.3f" % (
            vde, REF_ACOUSTIC_PINS["vde"])
    assert bap <= REF_ACOUSTIC_PINS["bap"], \
        "BAP %.3f worse than reference pin %.3f" % (
            bap, REF_ACOUSTIC_PINS["bap"])
    for key, got in [("mcd", mcd), ("f0_rmse", f0_rmse), ("vde", vde),
                     ("bap", bap)]:
        cap = RECORDED_ACOUSTIC[key] * (1.0 + MARGIN_RTOL)
        assert got <= cap, \
            "%s %.3f eroded the recorded parity margin (recorded " \
            "%.3f, cap %.3f)" % (key, got, RECORDED_ACOUSTIC[key], cap)


def test_duration_beats_reference_pin(workdir, ref_ids,
                                      ref_num_questions, tmp_path):
    # Phone-level questions (first frame of each phone), as the
    # ljspeech recipe builds them.
    from idiaptts_tpu.data.normalisation import MinMaxExtractor
    dir_q_phone = os.path.join(workdir, "questions_phone")
    if not os.path.isdir(dir_q_phone):
        os.makedirs(dir_q_phone, exist_ok=True)
        extractor = MinMaxExtractor()
        for id_name in ref_ids:
            q = QuestionLabelGen.load_sample(
                id_name, os.path.join(workdir, "questions"),
                num_questions=ref_num_questions)
            dur = PhonemeDurationLabelGen.load_sample(
                id_name, os.path.join(workdir, "dur"))
            frames = dur.sum(axis=1).astype(np.int64)
            starts = np.minimum(np.cumsum(frames) - frames, len(q) - 1)
            phone_q = q[starts]
            extractor.add_sample(phone_q)
            phone_q.astype(np.float32).tofile(
                os.path.join(dir_q_phone, id_name + ".questions"))
        extractor.save(os.path.join(dir_q_phone, "all"))

    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = ref_num_questions
    hparams.out_dir = str(tmp_path)
    hparams.model_name = "ref_parity_duration"
    hparams.epochs = EPOCHS
    hparams.batch_size_train = 4
    hparams.seed = 1
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.25
    trainer = DurationModelTrainer(
        hparams, list(ref_ids), dir_phoneme_labels=dir_q_phone,
        dir_durations=os.path.join(workdir, "dur"))
    trainer.init(hparams)
    trainer.train(hparams)
    rmse, pearson = trainer.benchmark(hparams, list(ref_ids))
    print("reference-parity duration benchmark: RMSE %.3f frames "
          "(pin %.3f), Pearson %.3f" % (rmse, REF_DURATION_RMSE_PIN,
                                        float(np.mean(pearson))))
    assert rmse <= REF_DURATION_RMSE_PIN, \
        "Duration RMSE %.3f worse than reference pin %.3f" % (
            rmse, REF_DURATION_RMSE_PIN)
    cap = RECORDED_DURATION_RMSE * (1.0 + MARGIN_RTOL)
    assert rmse <= cap, \
        "Duration RMSE %.3f eroded the recorded parity margin " \
        "(recorded %.3f, cap %.3f)" % (rmse, RECORDED_DURATION_RMSE, cap)
