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

    # Online serving: concurrent text requests through TTSModel.serve
    # (front end + duration on the host, acoustic + vocoder batched by
    # the SynthesisServer).
    server = TTSModel.serve(tts_hparams, max_batch=4, max_wait_ms=50.0)
    try:
        futs = [server.submit("hello world this is online serving"),
                server.submit("another request at the same time")]
        for fut in futs:
            wav = fut.result(timeout=300)
            assert len(wav) > 0 and np.isfinite(wav).all()
        assert server.stats()["requests"] == 2
    finally:
        server.shutdown()

    # Reference checkpoint-path interface (TTSModel.py:115-163):
    # trainers rebuilt purely from checkpoint directories + norm-stat
    # dirs, no trainer objects passed in.
    path_hparams = TTSModel.create_hparams()
    path_hparams.question_file = q_file
    path_hparams.num_questions = num_questions
    path_hparams.setattr_no_type_check("num_coded_sps", 20)
    path_hparams.setattr_no_type_check(
        "duration_model", os.path.join(str(tmp_path / "exp"), "dm"))
    path_hparams.setattr_no_type_check(
        "acoustic_model", os.path.join(str(tmp_path / "exp"), "am"))
    path_hparams.setattr_no_type_check("duration_labels_dir",
                                       dur_q_dir)
    path_hparams.setattr_no_type_check(
        "question_labels_norm_file",
        os.path.join(fixtures_dir, "questions"))
    path_hparams.setattr_no_type_check(
        "world_features_dir", os.path.join(fixtures_dir, "WORLD"))
    path_hparams.synth_dir = str(tmp_path / "tts_out_paths")
    paths2 = TTSModel.run_DM_AM(path_hparams, label_dir=label_dir,
                                id_list=id_list[:1])
    assert len(paths2) == 1
    for path in paths2.values():
        raw, fs = get_raw(path)
        assert len(raw) > fs / 2 and np.isfinite(raw).all()


def test_front_end_builtin_fallback(tmp_path):
    """Without front_end_cmd the builtin text front end produces
    full-context labels (Festival-free path)."""
    from idiaptts_tpu.hparams import ExtendedHParams
    hparams = ExtendedHParams.create_hparams()
    ids = TTSModel.run_front_end(hparams, ["Hello world.", "Tests 42"],
                                 str(tmp_path))
    assert ids == ["utt000", "utt001"]
    with open(os.path.join(str(tmp_path), "utt000.lab")) as f:
        lines = [l.strip() for l in f if l.strip()]
    # sil + phones + sil, quinphone context present.
    assert lines[0].startswith("xx~xx-sil+")
    assert all("/A/" in l and "/J/" in l for l in lines)


def test_builtin_frontend_text_to_speech(tmp_path):
    """Full Festival-free pipeline: text -> builtin front end ->
    duration model -> aligned labels -> ARPABET questions -> acoustic
    model -> WORLD wav, with models trained on builtin-front-end data
    (the reference needs Festival + its shipped .hed for this;
    run_DM_AM role on a fresh machine)."""
    import idiaptts_tpu
    from idiaptts_tpu.data.normalisation import MinMaxExtractor
    from idiaptts_tpu.data.questions import (HTSLabelNormalisation,
                                             QuestionLabelGen,
                                             QuestionSet)
    from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.ops.audio_io import get_raw
    from idiaptts_tpu.synth.frontend import BuiltinFrontEnd

    q_file = os.path.join(os.path.dirname(idiaptts_tpu.__file__),
                          "assets", "questions-en-arpabet_dnn.hed")
    num_q = QuestionSet(q_file).dict_size + 9

    texts = ["the quick brown fox jumps over the lazy dog",
             "speech synthesis with no external front end",
             "a stitch in time saves nine",
             "pack my box with five dozen jugs",
             "how vexingly quick daft zebras jump",
             "numbers like 42 are spelled out"]
    fe = BuiltinFrontEnd()
    rng = np.random.RandomState(0)
    fs = 16000
    label_full = str(tmp_path / "labels_full")
    aligned_dir = str(tmp_path / "label_state_align")
    dur_dir = str(tmp_path / "dur")
    wav_dir = str(tmp_path / "wav")
    for d in (aligned_dir, dur_dir, wav_dir):
        os.makedirs(d)
    ids = fe.write_labels(texts, label_full)
    for uid in ids:
        with open(os.path.join(label_full, uid + ".lab")) as f:
            labels = [l.strip() for l in f if l.strip()]
        dur = rng.randint(1, 6, size=(len(labels), 5))
        lines = TTSModel.write_durations_into_labels(labels, dur)
        with open(os.path.join(aligned_dir, uid + ".lab"), "w") as f:
            f.write("\n".join(lines) + "\n")
        dur.astype(np.float32).tofile(
            os.path.join(dur_dir, uid + ".dur"))
        # Speech-like waveform of matching length for feature targets.
        n = int(dur.sum()) * int(fs * 0.005)
        t = np.arange(n) / fs
        wav = (0.3 * np.sin(2 * np.pi * 140 * t)
               + 0.1 * rng.randn(n)).astype(np.float32)
        from idiaptts_tpu.ops.audio_io import raw_to_file
        raw_to_file(os.path.join(wav_dir, uid + ".wav"), wav, fs)

    # Features for training: WORLD extraction + questions.
    world_dir = str(tmp_path / "WORLD")
    gen = WorldFeatLabelGen(dir_labels=world_dir, add_deltas=True,
                            num_coded_sps=20)
    gen.gen_data(wav_dir, dir_out=world_dir, id_list=ids)
    q_dir = str(tmp_path / "questions")
    QuestionLabelGen.gen_data(aligned_dir, q_file, dir_out=q_dir,
                              id_list=ids)
    dur_q_dir = str(tmp_path / "dur_questions")
    os.makedirs(dur_q_dir)
    operator = HTSLabelNormalisation(q_file, add_frame_features=False,
                                     subphone_feats="none")
    extractor = MinMaxExtractor()
    for uid in ids:
        with open(os.path.join(label_full, uid + ".lab")) as f:
            labels = TTSModel.strip_timings(
                [l for l in f if l.strip()])
        q = np.stack([operator.question_set.match(lab)
                      for lab in labels]).astype(np.float32)
        extractor.add_sample(q)
        q.tofile(os.path.join(dur_q_dir, uid + ".questions"))
    extractor.save(os.path.join(dur_q_dir, "all"))

    dur_hparams = DurationModelTrainer.create_hparams()
    dur_hparams.num_questions = num_q - 9
    dur_hparams.out_dir = str(tmp_path / "exp")
    dur_hparams.model_name = "dm"
    dur_hparams.epochs = 1
    dur_hparams.batch_size_train = 3
    dur_hparams.seed = 1
    dur_hparams.test_set_perc = 0.0
    dur_hparams.val_set_perc = 0.2
    dur_hparams.use_best_as_final_model = False
    dur_trainer = DurationModelTrainer(
        dur_hparams, list(ids), dir_phoneme_labels=dur_q_dir,
        dir_durations=dur_dir)
    dur_trainer.init(dur_hparams)
    dur_trainer.train(dur_hparams)

    am_hparams = AcousticModelTrainer.create_hparams()
    am_hparams.num_questions = num_q
    am_hparams.num_coded_sps = 20
    am_hparams.out_dir = str(tmp_path / "exp")
    am_hparams.model_name = "am"
    am_hparams.epochs = 1
    am_hparams.batch_size_train = 3
    am_hparams.seed = 1
    am_hparams.test_set_perc = 0.0
    am_hparams.val_set_perc = 0.2
    am_hparams.use_best_as_final_model = False
    am_hparams.synth_fs = fs
    am_trainer = AcousticModelTrainer(
        am_hparams, list(ids), dir_question_labels=q_dir,
        dir_world_features=world_dir)
    cfg = convert_legacy_string("RNNDYN-1_RELU_32-1_FC_67", num_q)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred_acoustic_features",)
    am_trainer.init(am_hparams, model_config=cfg)
    am_trainer.train(am_hparams)

    tts_hparams = am_hparams
    tts_hparams.synth_dir = str(tmp_path / "tts_out")
    tts_hparams.add_hparams(duration_trainer=dur_trainer,
                            acoustic_trainer=am_trainer)
    tts_hparams.question_file = q_file
    paths = TTSModel.run_DM_AM(
        tts_hparams, input_strings=["hello world", "testing speech"])
    assert len(paths) == 2
    for id_name, path in paths.items():
        raw, out_fs = get_raw(path)
        assert out_fs == fs
        assert len(raw) > fs / 10
        assert np.all(np.isfinite(raw))


def test_write_durations_into_labels():
    labels = ["a-b+c", "b-c+d"]
    dur = np.array([[2, 1, 1, 1, 1], [1, 1, 1, 1, 2]])
    lines = TTSModel.write_durations_into_labels(labels, dur)
    assert len(lines) == 10
    assert lines[0] == "0 100000 a-b+c[2]"
    assert lines[1].startswith("100000 150000")
    # Total time = sum of durations * 50000.
    assert lines[-1].split()[1] == str(dur.sum() * 50000)
