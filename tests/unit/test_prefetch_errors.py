"""Prefetch-thread error propagation: a failing reader must kill the epoch
loudly instead of silently truncating it (the reference's DataLoader
re-raises worker exceptions, ModularModelHandlerPyTorch.py:683)."""

import numpy as np
import pytest

from idiaptts_tpu.train.trainer import ModularTrainer


class _PoisonedDataset:
    """Yields one good sample, then raises (corrupt npz stand-in)."""

    def __init__(self, fail_on="u2"):
        self.fail_on = fail_on

    def get_id_name(self, id_name):
        if id_name == self.fail_on:
            raise OSError(f"corrupt npz for {id_name}")
        return {"x": np.zeros((4, 3), np.float32), "_id_list": id_name}, self


def _batches(dataset, ids, batch_size, **kw):
    # _batches does not touch self — call it unbound on a dummy instance.
    return ModularTrainer._batches(object.__new__(ModularTrainer), dataset,
                                   ids, batch_size, **kw)


def test_prefetch_propagates_producer_error():
    ds = _PoisonedDataset()
    it = _batches(ds, ["u1", "u2", "u3"], 1, prefetch=2)
    next(it)  # first batch is fine
    with pytest.raises(OSError, match="corrupt npz"):
        list(it)


def test_prefetch_propagates_error_in_first_batch():
    ds = _PoisonedDataset(fail_on="u1")
    with pytest.raises(OSError, match="corrupt npz"):
        list(_batches(ds, ["u1"], 1, prefetch=2))


def test_unprefetched_path_also_raises():
    ds = _PoisonedDataset()
    with pytest.raises(OSError, match="corrupt npz"):
        list(_batches(ds, ["u1", "u2"], 1, prefetch=0))


def test_prefetch_yields_all_batches_when_healthy():
    ds = _PoisonedDataset(fail_on=None)
    batches = list(_batches(ds, ["u1", "u2", "u3"], 2, prefetch=2))
    assert len(batches) == 2
