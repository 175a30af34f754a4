"""End-to-end duration model pipeline on the repo fixtures:
questions (phone level) -> FFN -> 5-state durations.  Mirrors the
reference's (disabled) test_DurationModelTrainer.py strategy: init,
train a few epochs with decreasing loss, benchmark, forward."""

import os

import numpy as np
import pytest

from idiaptts_tpu.data.phonemes import PhonemeDurationLabelGen
from idiaptts_tpu.data.questions import QuestionLabelGen
from idiaptts_tpu.train.duration import DurationModelTrainer

@pytest.fixture(scope="module")
def prepared_dirs(fixtures_dir, id_list, question_file,
                  tmp_path_factory):
    """Phone-level questions + durations extracted from fixtures."""
    base = tmp_path_factory.mktemp("dur_data")
    dir_questions = str(base / "questions")
    dir_dur = os.path.join(fixtures_dir, "dur")
    # Phone-level questions: one row per phone = frame questions
    # collapsed. Generate frame questions, then take the first frame of
    # each phone via durations.
    label_dir = os.path.join(fixtures_dir, "labels", "label_state_align")
    label_dict, vmin, vmax = QuestionLabelGen.gen_data(
        label_dir, question_file, dir_out=None, id_list=id_list,
        return_dict=True)
    os.makedirs(dir_questions, exist_ok=True)
    from idiaptts_tpu.data.normalisation import MinMaxExtractor
    extractor = MinMaxExtractor()
    for id_name, frames in label_dict.items():
        dur = PhonemeDurationLabelGen.load_sample(id_name, dir_dur)
        frame_idx = np.cumsum(dur.sum(axis=1).astype(np.int64)) \
            - dur.sum(axis=1).astype(np.int64)
        frame_idx = np.minimum(frame_idx, len(frames) - 1)
        phone_level = frames[frame_idx]
        extractor.add_sample(phone_level)
        phone_level.astype(np.float32).tofile(
            os.path.join(dir_questions, id_name + ".questions"))
    extractor.save(os.path.join(dir_questions, "all"))
    return dir_questions, dir_dur


def test_duration_pipeline(prepared_dirs, id_list, num_questions,
                           tmp_path):
    dir_questions, dir_dur = prepared_dirs
    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.out_dir = str(tmp_path / "exp")
    hparams.model_name = "test_dur"
    hparams.epochs = 3
    hparams.batch_size_train = 4
    hparams.batch_size_val = 6
    hparams.learning_rate = 0.002
    hparams.seed = 1
    hparams.use_best_as_final_model = False
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.34

    trainer = DurationModelTrainer(hparams, list(id_list),
                                   dir_phoneme_labels=dir_questions,
                                   dir_durations=dir_dur)
    trainer.init(hparams)
    all_loss, all_loss_train = trainer.train(hparams)
    assert len(all_loss_train) == 3
    assert all_loss_train[-1] < all_loss_train[0], all_loss_train

    # Benchmark produces Dur-RMSE and Pearson.
    rmse, pearson = trainer.benchmark(hparams,
                                      trainer.id_list_train[:3])
    assert 0 < rmse < 80
    assert pearson.shape == (5,)

    # Forward returns rounded non-negative integer durations.
    out = trainer.forward(hparams, trainer.id_list_train[:2])
    for id_name, dur in out.items():
        assert dur.dtype == np.int64
        assert np.all(dur >= 0)
        ref = PhonemeDurationLabelGen.load_sample(id_name, dir_dur)
        assert dur.shape == ref.shape

    # Checkpoints were written.
    nn_dir = os.path.join(hparams.out_dir, "test_dur", "nn")
    assert os.path.isfile(os.path.join(nn_dir, "config.json"))
    assert os.path.isfile(os.path.join(nn_dir, "params_last"))


def test_duration_resume_checkpoint(prepared_dirs, id_list,
                                    num_questions, tmp_path):
    dir_questions, dir_dur = prepared_dirs
    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.out_dir = str(tmp_path / "exp")
    hparams.model_name = "resume_dur"
    hparams.epochs = 1
    hparams.batch_size_train = 4
    hparams.learning_rate = 0.001
    hparams.seed = 1
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.2
    hparams.use_best_as_final_model = False

    trainer = DurationModelTrainer(hparams, list(id_list),
                                   dir_phoneme_labels=dir_questions,
                                   dir_durations=dir_dur)
    trainer.init(hparams)
    trainer.train(hparams)
    steps_first = trainer.model_handler.total_steps
    assert steps_first > 0

    # Resume from the written checkpoint into a new trainer.
    hparams.load_newest_checkpoint = True
    trainer2 = DurationModelTrainer(hparams, list(id_list),
                                    dir_phoneme_labels=dir_questions,
                                    dir_durations=dir_dur)
    trainer2.init(hparams)
    assert trainer2.model_handler.params is not None
    trainer2.train(hparams)
    assert trainer2.model_handler.total_steps > 0

def test_reference_surface_helpers(prepared_dirs, id_list,
                                   num_questions, tmp_path):
    """ModularTrainer compatibility helpers: loss recording/logging,
    checkpoint delegates, plots, gen_output (ModularTrainer.py:119-1012
    roles)."""
    dir_questions, dir_dur = prepared_dirs
    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.out_dir = str(tmp_path / "exp")
    hparams.model_name = "helpers"
    hparams.epochs = 2
    hparams.batch_size_train = 4
    hparams.seed = 3
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.34
    trainer = DurationModelTrainer(hparams, list(id_list),
                                   dir_phoneme_labels=dir_questions,
                                   dir_durations=dir_dur)
    trainer.init(hparams)
    trainer.sanity_check_train(hparams)
    trainer.log_validation_set()
    trainer.log_test_set()
    trainer.log_memory()
    trainer.train(hparams)
    # Loss records filled during training.
    train, val = trainer.get_losses()
    assert train and all(len(v) == 2 for v in train.values())
    assert val and all(len(v) >= 1 for v in val.values())
    trainer.log_losses()
    # Checkpoint delegates.
    trainer.save_checkpoint(hparams, epoch=99)
    best_loss, _ = trainer.load_best_model(hparams)
    assert best_loss is not None
    trainer.reset_best_loss()
    assert trainer.best_loss == np.inf
    assert os.path.isdir(trainer.get_model_path(hparams))
    # Data access.
    assert trainer.get_dataset("train") is not None
    assert trainer.get_labels("questions", id_list[0]).shape[1] == num_questions
    # gen_output writes npz files.
    out = trainer.gen_output(hparams, id_list[:2])
    assert len(out) == 2
    import glob
    hparams.add_hparams(save_output_dir=None)
    files = glob.glob(os.path.join(hparams.out_dir, "output", "*.npz"))
    assert len(files) == 2
    # Plots.
    p1 = trainer.plot1d(np.sin(np.linspace(0, 7, 100)),
                        str(tmp_path / "curve.pdf"))
    p2 = trainer.plot_specshow(np.random.rand(50, 20),
                               str(tmp_path / "spec.pdf"))
    assert os.path.isfile(p1) and os.path.isfile(p2)


def test_backprop_loss_subset(prepared_dirs, id_list, num_questions,
                              tmp_path):
    """backprop_loss_names (get_summed_losses_subset role,
    ModularModelHandlerPyTorch.py:915-925): a monitor-only loss is
    computed and logged every epoch but excluded from the optimised
    total, and scheduler_loss_names selects the Plateau metric."""
    from idiaptts_tpu.models.losses import NamedLoss

    dir_questions, dir_dur = prepared_dirs
    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.out_dir = str(tmp_path / "exp")
    hparams.model_name = "dur_subset"
    hparams.epochs = 2
    hparams.batch_size_train = 4
    hparams.learning_rate = 0.002
    hparams.seed = 1
    hparams.use_best_as_final_model = False
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.34
    hparams.backprop_loss_names = ["mse"]
    hparams.scheduler_loss_names = ["mse"]
    hparams.scheduler_type = "Plateau"

    trainer = DurationModelTrainer(hparams, list(id_list),
                                   dir_phoneme_labels=dir_questions,
                                   dir_durations=dir_dur)
    loss_configs = [
        NamedLoss.Config("mse", "MSELoss",
                         ("pred_durations", "durations"),
                         seq_mask="_seq_mask", reduction="mean"),
        NamedLoss.Config("monitor_l1", "L1Loss",
                         ("pred_durations", "durations"),
                         seq_mask="_seq_mask", reduction="mean"),
    ]
    trainer.init(hparams, loss_configs=loss_configs)
    assert trainer.model_handler.backprop_loss_names == ("mse",)
    all_loss, train_losses = trainer.train(hparams)
    # Both losses are recorded each epoch...
    train_hist, val_hist = trainer.get_losses()
    assert "monitor_l1" in train_hist and len(train_hist["monitor_l1"])
    # ...and training still progresses on the optimised subset.
    assert np.isfinite(train_losses).all()
    assert min(train_losses) <= train_losses[0]


def test_load_newest_without_checkpoint_trains_fresh(
        prepared_dirs, id_list, num_questions, tmp_path):
    """load_newest_checkpoint with NO checkpoint on disk falls back to
    building the default model and training fresh (resumable-recipe
    first-run semantics; regression for the init probe guard)."""
    dir_questions, dir_dur = prepared_dirs
    hparams = DurationModelTrainer.create_hparams()
    hparams.num_questions = num_questions
    hparams.out_dir = str(tmp_path / "exp")
    hparams.model_name = "dur_fresh"
    hparams.epochs = 1
    hparams.batch_size_train = 4
    hparams.learning_rate = 0.002
    hparams.seed = 1
    hparams.use_best_as_final_model = False
    hparams.test_set_perc = 0.0
    hparams.val_set_perc = 0.34
    hparams.load_newest_checkpoint = True

    trainer = DurationModelTrainer(hparams, list(id_list),
                                   dir_phoneme_labels=dir_questions,
                                   dir_durations=dir_dur)
    trainer.init(hparams)   # must not raise "model_config required"
    _, train_losses = trainer.train(hparams)
    assert len(train_losses) == 1 and np.isfinite(train_losses).all()
