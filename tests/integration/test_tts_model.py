"""End-to-end TTS pipeline: HTS full labels -> duration model ->
re-aligned labels -> questions -> acoustic model -> WORLD synthesis
(TTSModel.run_DM_AM parity; the Festival front end is exercised only up
to its subprocess interface)."""

import os

import numpy as np
import pytest

from idiaptts_tpu.synth.tts_model import TTSModel
from idiaptts_tpu.train.acoustic import AcousticModelTrainer
from idiaptts_tpu.train.duration import DurationModelTrainer

def test_run_dm_am(fixtures_dir, id_list, question_file,
                   num_questions, tmp_path):
    q_file = question_file
    label_dir = os.path.join(fixtures_dir, "labels",
                             "label_state_align")

    # Duration model on phone-level questions.
    from idiaptts_tpu.data.questions import HTSLabelNormalisation
    from idiaptts_tpu.data.phonemes import PhonemeDurationLabelGen
    from idiaptts_tpu.data.normalisation import MinMaxExtractor
    dur_q_dir = str(tmp_path / "dur_questions")
    os.makedirs(dur_q_dir)
    operator = HTSLabelNormalisation(q_file, add_frame_features=False,
                                     subphone_feats="none")
    extractor = MinMaxExtractor()
    for id_name in id_list:
        with open(os.path.join(label_dir, id_name + ".lab")) as f:
            lines = [l for l in f if l.strip()]
        labels = TTSModel.strip_timings(lines)
        q = np.stack([operator.question_set.match(lab)
                      for lab in labels]).astype(np.float32)
        extractor.add_sample(q)
        q.tofile(os.path.join(dur_q_dir, id_name + ".questions"))
    extractor.save(os.path.join(dur_q_dir, "all"))

    dur_hparams = DurationModelTrainer.create_hparams()
    dur_hparams.num_questions = num_questions - 9
    dur_hparams.out_dir = str(tmp_path / "exp")
    dur_hparams.model_name = "dm"
    dur_hparams.epochs = 2
    dur_hparams.batch_size_train = 4
    dur_hparams.learning_rate = 0.002
    dur_hparams.seed = 1
    dur_hparams.test_set_perc = 0.0
    dur_hparams.val_set_perc = 0.2
    dur_hparams.use_best_as_final_model = False
    dur_trainer = DurationModelTrainer(
        dur_hparams, list(id_list), dir_phoneme_labels=dur_q_dir,
        dir_durations=os.path.join(fixtures_dir, "dur"))
    dur_trainer.init(dur_hparams)
    dur_trainer.train(dur_hparams)

    # Acoustic model on frame-level questions + fixture WORLD feats.
    am_hparams = AcousticModelTrainer.create_hparams()
    am_hparams.num_questions = num_questions
    am_hparams.num_coded_sps = 20
    am_hparams.out_dir = str(tmp_path / "exp")
    am_hparams.model_name = "am"
    am_hparams.epochs = 1
    am_hparams.batch_size_train = 3
    am_hparams.learning_rate = 0.001
    am_hparams.seed = 1
    am_hparams.test_set_perc = 0.0
    am_hparams.val_set_perc = 0.2
    am_hparams.use_best_as_final_model = False
    am_hparams.synth_fs = 16000
    am_trainer = AcousticModelTrainer(
        am_hparams, list(id_list),
        dir_question_labels=os.path.join(fixtures_dir, "questions"),
        dir_world_features=os.path.join(fixtures_dir, "WORLD"))
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    cfg = convert_legacy_string("RNNDYN-1_RELU_64-1_FC_67", num_questions)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred_acoustic_features",)
    am_trainer.init(am_hparams, model_config=cfg)
    am_trainer.train(am_hparams)

    # Full pipeline from the fixture labels (no Festival binary).
    tts_hparams = am_hparams
    tts_hparams.synth_dir = str(tmp_path / "tts_out")
    tts_hparams.add_hparams(duration_trainer=dur_trainer,
                            acoustic_trainer=am_trainer)
    tts_hparams.question_file = q_file
    paths = TTSModel.run_DM_AM(tts_hparams, label_dir=label_dir,
                               id_list=id_list[:2])
    assert len(paths) == 2
    from idiaptts_tpu.ops.audio_io import get_raw
    for id_name, path in paths.items():
        assert os.path.isfile(path)
        raw, fs = get_raw(path)
        assert len(raw) > fs / 2


def test_front_end_requires_command(tmp_path):
    from idiaptts_tpu.hparams import ExtendedHParams
    hparams = ExtendedHParams.create_hparams()
    with pytest.raises(RuntimeError):
        TTSModel.run_front_end(hparams, ["hello"], str(tmp_path))


def test_write_durations_into_labels():
    labels = ["a-b+c", "b-c+d"]
    dur = np.array([[2, 1, 1, 1, 1], [1, 1, 1, 1, 2]])
    lines = TTSModel.write_durations_into_labels(labels, dur)
    assert len(lines) == 10
    assert lines[0] == "0 100000 a-b+c[2]"
    assert lines[1].startswith("100000 150000")
    # Total time = sum of durations * 50000.
    assert lines[-1].split()[1] == str(dur.sum() * 50000)
