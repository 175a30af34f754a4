"""Dataset layer tests: mirrors the reference's
unit/test_PyTorchDatareadersDataset.py strategy (mocked readers for
match_length cycles and 2-D matching) plus bucketed collate checks."""

import numpy as np
import pytest

from idiaptts_tpu.data.dataset import (DatareadersDataset,
                                       WindowingDatareadersDataset,
                                       batch_decollate, bucket_length,
                                       collate_batch)
from idiaptts_tpu.data.phonemes import PhonemeDurationLabelGen
from idiaptts_tpu.data.reader import DataReader


class MockReader(DataReader):
    def __init__(self, name, data, match_length=None, max_frames=None,
                 random_select=True):
        super().__init__(DataReader.Config(
            name, match_length=match_length, max_frames=max_frames,
            random_select=random_select))
        self.data = data

    def load(self, id_name):
        return np.copy(self.data[id_name])


def test_merge_and_duplicate_detection():
    r1 = MockReader("a", {"u1": np.ones((10, 2))})
    r2 = MockReader("a", {"u1": np.ones((10, 2))})
    ds = DatareadersDataset(["u1"], [r1, r2])
    with pytest.raises(KeyError):
        ds[0]


def test_match_length_trims_to_reference():
    r1 = MockReader("feat", {"u1": np.arange(12)[:, None].astype(float)},
                    match_length="ref")
    r2 = MockReader("ref", {"u1": np.zeros((10, 1))})
    ds = DatareadersDataset(["u1"], [r1, r2])
    out, _ = ds[0]
    assert len(out["feat"]) == 10
    # Trim removes diff//2 from the front, rest from the end.
    assert out["feat"][0, 0] == 1.0 and out["feat"][-1, 0] == 10.0


def test_match_length_cycle():
    r1 = MockReader("a", {"u1": np.zeros((12, 1))}, match_length="b")
    r2 = MockReader("b", {"u1": np.zeros((10, 1))}, match_length="a")
    ds = DatareadersDataset(["u1"], [r1, r2])
    out, _ = ds[0]
    assert len(out["a"]) == len(out["b"]) == 10


def test_max_frames_crop_propagates():
    rng = np.random.RandomState(0)
    r1 = MockReader("x", {"u1": rng.randn(50, 3)}, match_length="y",
                    max_frames=20, random_select=False)
    r2 = MockReader("y", {"u1": rng.randn(50, 2)}, match_length="x")
    ds = DatareadersDataset(["u1"], [r1, r2])
    out, _ = ds[0]
    assert len(out["x"]) == 20
    assert len(out["y"]) == 20


def test_windowing_dataset():
    r = MockReader("feat", {"u1": np.arange(120)[:, None].astype(float)})
    ds = WindowingDatareadersDataset(["u1"], [r], window_size=50,
                                     window_step=25)
    windows = list(ds)
    assert len(windows) == 4
    first, _ = windows[0]
    assert len(first["feat"]) == 50
    assert first["feat"][0, 0] == 0.0
    second, _ = windows[1]
    assert second["feat"][0, 0] == 25.0


def test_bucket_length():
    assert bucket_length(100) == 128
    assert bucket_length(128) == 128
    assert bucket_length(129) == 256
    assert bucket_length(5000) == 8192


def test_collate_and_decollate():
    samples = [
        {"x": np.ones((100, 4)), "y": np.ones((100, 2)),
         "_id_list": "u1"},
        {"x": 2 * np.ones((70, 4)), "y": 2 * np.ones((70, 2)),
         "_id_list": "u2"},
    ]
    batch = collate_batch(samples)
    assert batch["x"].shape == (2, 128, 4)   # bucketed to 128
    assert batch["_seq_mask"].shape == (2, 128, 1)
    assert batch["_seq_mask"][0].sum() == 100
    assert batch["_seq_mask"][1].sum() == 70
    assert batch["x"][1, 70:].sum() == 0     # padding zeros

    back = batch_decollate(batch)
    assert len(back) == 2
    assert back[1]["x"].shape == (70, 4)
    np.testing.assert_array_equal(back[1]["x"], samples[1]["x"])
    assert back[0]["_id_list"] == "u1"


def test_collate_time_major():
    samples = [{"x": np.ones((30, 4))}, {"x": np.ones((50, 4))}]
    batch = collate_batch(samples, batch_first=False)
    assert batch["x"].shape == (128, 2, 4)


def test_durations_to_hard_attention_matrix():
    A = PhonemeDurationLabelGen.durations_to_hard_attention_matrix(
        np.array([3, 0, 1, 2]))
    expected = np.array([
        [1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0],
        [0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 0, 1]], dtype=np.float32)
    np.testing.assert_array_equal(A, expected)


def test_duration_labelgen_fixtures(fixtures_dir, uid):
    import os
    dur = PhonemeDurationLabelGen.load_sample(
        uid, os.path.join(fixtures_dir, "dur"))
    assert dur.shape[1] == 5
    assert np.all(dur >= 0)
    # Durations from the state-aligned labels should match.
    dur2 = PhonemeDurationLabelGen.load_sample(
        uid, os.path.join(fixtures_dir, "labels",
                                   "label_state_align"))
    assert dur2.shape == dur.shape
    np.testing.assert_allclose(dur, dur2, atol=1e-5)


def test_phoneme_labelgen_fixtures(fixtures_dir, uid):
    import os
    from idiaptts_tpu.data.phonemes import PhonemeLabelGen
    config = PhonemeLabelGen.Config(
        name="phonemes",
        directory=os.path.join(fixtures_dir, "labels", "mono_no_align"),
        file_symbol_dict=os.path.join(fixtures_dir, "labels",
                                      "mono_phone.list"),
        label_type="mono_no_align")
    reader = config.create_reader()
    sample = reader[uid]
    ids = sample["phonemes"]
    assert ids.ndim == 2 and ids.shape[1] == 1
    assert ids.min() >= 0
    # One-hot + EOF variant.
    config2 = PhonemeLabelGen.Config(
        name="phonemes",
        directory=os.path.join(fixtures_dir, "labels", "mono_no_align"),
        file_symbol_dict=os.path.join(fixtures_dir, "labels",
                                      "mono_phone.list"),
        label_type="mono_no_align", one_hot=True, add_EOF=True)
    reader2 = config2.create_reader()
    one_hot = reader2[uid]["phonemes"]
    assert one_hot.shape == (len(ids) + 1, reader2.num_symbols)
    np.testing.assert_array_equal(one_hot.sum(1), 1.0)
    # state-align parsing gives the same phoneme count as durations.
    config3 = PhonemeLabelGen.Config(
        name="phonemes",
        directory=os.path.join(fixtures_dir, "labels",
                               "label_state_align"),
        file_symbol_dict=os.path.join(fixtures_dir, "labels",
                                      "mono_phone.list"),
        label_type="full_state_align")
    ids3 = config3.create_reader()[uid]["phonemes"]
    dur = PhonemeDurationLabelGen.load_sample(
        uid, os.path.join(fixtures_dir, "dur"))
    assert len(ids3) == len(dur)


def test_intercross_reader_swaps_within_group():
    from idiaptts_tpu.data.category import IntercrossDataReader

    class _Cfg:
        def __init__(self, data):
            self.data = data

        def create_reader(self):
            return MockReader("feat", self.data)

    data = {"spk1_a": np.zeros((5, 1)), "spk1_b": np.ones((5, 1)),
            "spk2_a": 2 * np.ones((5, 1))}
    config = IntercrossDataReader.Config(
        _Cfg(data), list(data), grouping_regex=r"(spk\d+)_",
        probability=1.0, seed=0)
    reader = config.create_reader()
    # Swaps stay within the speaker group.
    seen = set()
    for _ in range(20):
        out = reader["spk1_a"]
        seen.add(float(out["feat"][0, 0]))
        assert out["_id_list"] == "spk1_a"
    assert seen <= {0.0, 1.0}
    # Single-member group never swaps outside.
    out = reader["spk2_a"]
    assert float(out["feat"][0, 0]) == 2.0


def test_category_reader_one_hot():
    from idiaptts_tpu.data.category import CategoryDataReader
    config = CategoryDataReader.Config(
        name="speaker", get_category_fn=lambda i: [1],
        one_hot=True, num_categories=3)
    reader = config.create_reader()
    out = reader["x"]["speaker"]
    np.testing.assert_array_equal(out, [[0.0, 1.0, 0.0]])


def test_multirate_lengths_plumbing():
    """Multi-rate batches (frame-rate conditioning + sample-rate
    waveform) keep per-feature lengths all the way into the model:
    the handler passes the `_lengths` dict through and modules select
    their own vector (reference prepare_batch per-reader lengths,
    ModularModelHandlerPyTorch.py:388-465)."""
    import jax.numpy as jnp
    from idiaptts_tpu.data.dataset import collate_batch
    from idiaptts_tpu.models.named import select_lengths
    from idiaptts_tpu.train.handler import ModularModelHandler

    rng = np.random.RandomState(0)
    samples = [
        {"cond": rng.randn(10, 4).astype(np.float32),
         "wave": rng.randn(80, 1).astype(np.float32)},
        {"cond": rng.randn(7, 4).astype(np.float32),
         "wave": rng.randn(56, 1).astype(np.float32)},
    ]
    batch = collate_batch(samples, pad_to_bucket=False)
    data, lengths = ModularModelHandler._batch_to_model_input(batch)
    assert isinstance(lengths, dict)
    np.testing.assert_array_equal(np.asarray(lengths["cond"]), [10, 7])
    np.testing.assert_array_equal(np.asarray(lengths["wave"]), [80, 56])
    # Modules pick the lengths of their own named features.
    np.testing.assert_array_equal(
        np.asarray(select_lengths(lengths, "wave")), [80, 56])
    np.testing.assert_array_equal(
        np.asarray(select_lengths(lengths, "missing", "cond")), [10, 7])
    # Plain vectors pass through unchanged.
    vec = jnp.asarray([3, 4])
    assert select_lengths(vec, "anything") is vec


def test_multirate_wavenet_masking_uses_target_lengths():
    """A WaveNetWrapper in a multi-rate batch must mask at the waveform
    rate: logits beyond the conditioning length but inside the target
    length still receive gradients (would be zeroed if the conditioning
    lengths were applied)."""
    import jax
    import jax.numpy as jnp
    from idiaptts_tpu.models.wavenet import WaveNetWrapper

    cfg = WaveNetWrapper.Config(
        input_names=("cond",), output_names=("pred_logits",),
        target_name="quantised", out_channels=16, residual_channels=4,
        gate_channels=8, skip_channels=4, num_layers=2, num_stacks=1)
    model = cfg.create_model()
    B, T_cond, T_wav = 2, 5, 40
    rng = np.random.RandomState(1)
    data = {
        "cond": jnp.asarray(rng.randn(B, T_wav, 3), jnp.float32),
        "quantised": jnp.asarray(
            rng.randint(0, 16, (B, T_wav)), jnp.int32),
    }
    lengths = {"cond": jnp.asarray([T_cond, T_cond]),
               "quantised": jnp.asarray([T_wav, T_wav - 8])}
    params = model.init(jax.random.PRNGKey(0), data, lengths=lengths,
                        training=True)
    out = model.apply(params, data, lengths=lengths, training=True)
    logits = out["pred_logits"]
    assert logits.shape == (B, T_wav, 16)
    # Frames past the conditioning length are still computed (nonzero)
    # because masking follows the waveform lengths.
    assert np.abs(np.asarray(logits[:, T_cond + 1:T_wav - 8])).max() > 0


def test_windowing_dataset_feeds_training_batches():
    """work_items/get_work_item expand utterances into windows for the
    trainer's batcher (regression: windowing only lived in __iter__,
    which the training path never used), and per-utterance statics
    neither cap the window length nor get sliced."""
    import numpy as np
    from idiaptts_tpu.data.dataset import WindowingDatareadersDataset

    class FakeReader:
        name = "frames"
        output_names = ("frames",)
        match_length = None
        max_frames = None

        def __getitem__(self, id_name):
            T = {"a": 120, "b": 40}[id_name]
            return {"frames": np.arange(T, dtype=np.float32)[:, None],
                    "_id_list": id_name}

    class StaticReader:
        name = "spk"
        output_names = ("spk",)
        match_length = None
        max_frames = None

        def __getitem__(self, id_name):
            return {"spk": np.asarray([3.0], np.float32),
                    "_id_list": id_name}

    ds = WindowingDatareadersDataset(
        ["a", "b"], [StaticReader(), FakeReader()],
        window_size=50, window_step=25)
    items = ds.work_items(["a", "b"])
    # a: 120 frames -> 1 + ceil(70/25) = 4 windows; b: 40 -> 1 window.
    assert len(items) == 5
    first, _ = ds.get_work_item(items[0])
    assert first["frames"].shape == (50, 1)
    assert first["spk"].shape == (1,)          # static untouched
    last_a, _ = ds.get_work_item(items[3])
    assert last_a["frames"][0, 0] == 75.0      # start = 3 * 25
    # __iter__ yields the same windows.
    assert sum(1 for _ in ds) == 5
