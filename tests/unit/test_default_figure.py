"""Default gen_figure_from_output: multi-grid figure with spec image,
curve overlays and binary-area rendering (ModularTrainer.py:889-937)."""

import os

import numpy as np

from idiaptts_tpu.hparams import ExtendedHParams
from idiaptts_tpu.train.trainer import ModularTrainer


def test_default_figure_multigrid(tmp_path):
    hp = ExtendedHParams.create_hparams()
    hp.set_hparam("out_dir", str(tmp_path))
    hp.set_hparam("model_name", "m")
    trainer = object.__new__(ModularTrainer)
    rng = np.random.RandomState(0)
    sample = {
        "pred_acoustic_features": rng.randn(50, 30).astype(np.float32),
        "lf0": rng.randn(50).astype(np.float32),
        "vuv": (rng.rand(50) > 0.5).astype(np.float32),
        "pair": rng.randn(50, 2).astype(np.float32),
        "_id_list": "utt1",  # non-array entries are skipped
    }
    path = ModularTrainer.gen_figure_from_output(trainer, "utt1", sample, hp)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
