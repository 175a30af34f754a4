"""End-to-end acoustic model pipeline on the repo fixtures:
frame-level questions -> biLSTM -> WORLD cmp features -> MLPG -> WORLD
synthesis.  Mirrors test_AcousticModelTrainer.py:66-170: init / train
with decreasing loss / benchmark (MCD, F0-RMSE, VDE, BAP) / synth with
waveform assertions."""

import os

import numpy as np
import pytest

from idiaptts_tpu.train.acoustic import AcousticModelTrainer


@pytest.fixture(scope="module")
def trainer_and_hparams(fixtures_dir, id_list, num_questions,
                        tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("acoustic_exp"))
    hparams = AcousticModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.num_coded_sps = 20
    hparams.out_dir = out_dir
    hparams.model_name = "test_acoustic"
    hparams.epochs = 6
    hparams.batch_size_train = 2
    hparams.batch_size_val = 6
    hparams.batch_size_benchmark = 6
    hparams.batch_size_synth = 2
    hparams.learning_rate = 0.001
    hparams.seed = 1
    hparams.use_best_as_final_model = True
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.25
    hparams.synth_fs = 16000

    # Small model for test speed.
    trainer = AcousticModelTrainer(
        hparams, list(id_list),
        dir_question_labels=os.path.join(fixtures_dir, "questions"),
        dir_world_features=os.path.join(fixtures_dir, "WORLD"))
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    cfg = convert_legacy_string("RNNDYN-1_RELU_64-1_BiLSTM_32-1_FC_67",
                                num_questions)
    cfg.input_names = ("questions",)
    cfg.output_names = ("pred_acoustic_features",)
    trainer.init(hparams, model_config=cfg)
    return trainer, hparams


def test_train_loss_decreases(trainer_and_hparams):
    trainer, hparams = trainer_and_hparams
    all_loss, all_loss_train = trainer.train(hparams)
    assert all_loss_train[-1] < all_loss_train[0]


def test_benchmark(trainer_and_hparams):
    trainer, hparams = trainer_and_hparams
    mcd, f0_rmse, vde, bap = trainer.benchmark(
        hparams, trainer.id_list_train[:3])
    # Undertrained tiny model: loose sanity ranges.
    assert 0 < mcd < 30
    assert 0 < f0_rmse < 200
    assert 0 <= vde <= 1
    assert 0 < bap < 40


def test_synth_writes_waveforms(trainer_and_hparams, tmp_path):
    trainer, hparams = trainer_and_hparams
    hparams.synth_dir = str(tmp_path / "synth")
    paths = trainer.synth(hparams, trainer.id_list_train[:1])
    for id_name, path in paths.items():
        assert os.path.isfile(path)
        from idiaptts_tpu.ops.audio_io import get_raw
        raw, fs = get_raw(path)
        assert fs == 16000
        assert len(raw) > fs / 2          # at least half a second
        # Undertrained tiny model: just require a non-degenerate signal.
        assert 1e-5 < np.abs(raw).max() <= 1.0


def test_copy_synth(trainer_and_hparams, tmp_path):
    """Synthesis from original features must produce a loud, speechy
    waveform (copy_synth :1093-1119; waveform assertions like
    test_ModularTrainer.py:940-1037)."""
    trainer, hparams = trainer_and_hparams
    hparams.synth_dir = str(tmp_path / "copy_synth")
    paths = trainer.copy_synth(hparams, trainer.id_list_train[:1])
    from idiaptts_tpu.ops.audio_io import get_raw
    for id_name, path in paths.items():
        raw, fs = get_raw(path)
        assert len(raw) > fs  # > 1 s
        rms = np.sqrt((raw ** 2).mean())
        assert rms > 0.01


def test_gen_figure(trainer_and_hparams, tmp_path):
    trainer, hparams = trainer_and_hparams
    hparams.synth_dir = str(tmp_path / "figs")
    paths = trainer.gen_figure(hparams, trainer.id_list_train[:1])
    assert all(os.path.isfile(p) for p in paths)


def test_fused_synth_matches_modular_path(trainer_and_hparams, tmp_path):
    """The fused one-program synth (model+MLPG+vocoder in a single jit)
    writes waveforms equivalent in duration and scale to the per-stage
    modular path."""
    trainer, hparams = trainer_and_hparams
    ids = trainer.id_list_train[:2]
    from idiaptts_tpu.ops.audio_io import get_raw

    hparams.synth_dir = str(tmp_path / "fused")
    hparams.use_fused_synth = True
    fused = trainer.synth(hparams, ids)
    hparams.synth_dir = str(tmp_path / "classic")
    hparams.use_fused_synth = False
    classic = trainer.synth(hparams, ids)
    assert set(fused) == set(classic)
    for id_name in fused:
        a, fs_a = get_raw(fused[id_name])
        b, fs_b = get_raw(classic[id_name])
        assert fs_a == fs_b
        assert len(a) == len(b)


def test_serve_front_door(trainer_and_hparams):
    """trainer.serve(): the batching SynthesisServer over the trained
    model's fused pipeline resolves concurrent requests to waveforms
    and reports occupancy (AcousticModelTrainer.serve role; serving is
    new beyond the reference)."""
    import numpy as np

    trainer, hparams = trainer_and_hparams
    server = trainer.serve(hparams, max_batch=4, max_wait_ms=50.0)
    try:
        _, _, load_inputs = trainer.build_serving(hparams)
        ids = (trainer.id_list_train + trainer.id_list_val
               + trainer.id_list_test)[:3]
        futs = [(i, server.submit(load_inputs(i))) for i in ids]
        hop = int(hparams.get("synth_fs", 16000)
                  * hparams.get("frame_size_ms", 5) / 1000)
        for id_name, fut in futs:
            wav = fut.result(timeout=300)
            assert len(wav) == len(load_inputs(id_name)) * hop
            assert np.isfinite(wav).all()
        stats = server.stats()
        assert stats["requests"] == len(ids)
        assert stats["x_realtime"] > 0
    finally:
        server.shutdown()


def test_synth_load_org_streams(trainer_and_hparams, tmp_path):
    """Per-stream ground-truth override at synthesis
    (AcousticModelTrainer.synthesize :457-520): with
    synth_load_org_lf0/vuv set the synthesised waveform differs from
    the all-predicted one (the org streams replace the predictions),
    and the file still decodes cleanly."""
    import numpy as np
    from idiaptts_tpu.ops.audio_io import get_raw

    trainer, hparams = trainer_and_hparams
    ids = trainer.id_list_train[:1]

    hparams.synth_dir = str(tmp_path / "plain")
    paths_plain = trainer.synth(hparams, ids)
    raw_plain, _ = get_raw(paths_plain[ids[0]])

    hparams.synth_dir = str(tmp_path / "org_streams")
    hparams.synth_load_org_sp = True
    hparams.synth_load_org_lf0 = True
    hparams.synth_load_org_vuv = True
    try:
        paths_org = trainer.synth(hparams, ids)
    finally:
        hparams.synth_load_org_sp = False
        hparams.synth_load_org_lf0 = False
        hparams.synth_load_org_vuv = False
    raw_org, fs = get_raw(paths_org[ids[0]])
    assert np.isfinite(raw_org).all() and len(raw_org) > fs / 4
    n = min(len(raw_plain), len(raw_org))
    assert not np.allclose(raw_plain[:n], raw_org[:n])
