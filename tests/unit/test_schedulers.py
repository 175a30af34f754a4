"""Scheduler semantics tests (test_ExtendedExponentialLR.py:63-76
closed-form-vs-stepped style) + EMA behaviour."""

import numpy as np
import pytest

from idiaptts_tpu.train.schedulers import (ConstantScheduler,
                                           ExponentialScheduler,
                                           ExtendedExponentialScheduler,
                                           NoamScheduler,
                                           PlateauScheduler,
                                           create_scheduler)


def test_factory():
    assert isinstance(create_scheduler(None, 0.1), ConstantScheduler)
    assert isinstance(create_scheduler("Plateau", 0.1),
                      PlateauScheduler)
    assert isinstance(create_scheduler("Noam", 0.1,
                                       {"warmup_steps": 10}),
                      NoamScheduler)
    with pytest.raises(NotImplementedError):
        create_scheduler("Nope", 0.1)


def test_exponential_closed_form():
    s = ExponentialScheduler(1.0, gamma=0.9)
    for epoch in (1, 5, 17):
        s.on_epoch(epoch)
        assert s.lr(0) == pytest.approx(0.9 ** epoch)


def test_extended_exponential_warmup_floor():
    s = ExtendedExponentialScheduler(1.0, gamma=0.5, warmup_steps=10,
                                     decay_steps=5, min_lr=0.05)
    assert s.lr(5) == 1.0                       # warmup holds base
    # Closed form after warmup.
    assert s.lr(20) == pytest.approx(max(0.05, 0.5 ** (10 / 5)))
    assert s.lr(10_000) == 0.05                 # floor


def test_noam_peak_at_warmup():
    s = NoamScheduler(1.0, warmup_steps=100)
    lrs = [s.lr(t) for t in range(1, 400)]
    assert int(np.argmax(lrs)) + 1 == 100
    # 1/sqrt(t) tail.
    assert lrs[-1] == pytest.approx(1.0 * 100 ** 0.5 * 399 ** -0.5)


def test_plateau_reduces_after_patience():
    s = PlateauScheduler(1.0, factor=0.5, patience=2)
    s.on_metric(1.0)
    for _ in range(2):
        s.on_metric(1.0)                        # no improvement
    assert s.current_lr == 1.0                  # within patience
    s.on_metric(1.0)
    assert s.current_lr == 0.5                  # reduced
    s.on_metric(0.1)                            # improvement resets
    s.on_metric(0.2)
    assert s.current_lr == 0.5


def test_state_dict_roundtrip():
    s = PlateauScheduler(1.0, factor=0.5, patience=1)
    s.on_metric(2.0)
    s.on_metric(2.0)
    s.on_metric(2.0)
    state = s.state_dict()
    s2 = PlateauScheduler(1.0)
    s2.load_state_dict(state)
    assert s2.current_lr == s.current_lr
    assert s2.best == s.best


def test_handler_iterations_per_scheduler_step():
    """With iterations_per_scheduler_step=N the scheduler index
    advances once per N iterations — the lr holds within a window."""
    from idiaptts_tpu.train.handler import ModularModelHandler
    h = ModularModelHandler.__new__(ModularModelHandler)
    h.base_lr = 1.0
    h.scheduler = NoamScheduler(1.0, warmup_steps=2)
    h.iterations_per_scheduler_step = 3
    lrs = []
    for step in range(9):
        h.total_steps = step
        lrs.append(h._current_lr())
    # Steps 0,1 -> index 0; 2..4 -> 1; 5..7 -> 2; 8 -> 3.
    assert lrs[0] == lrs[1]
    assert lrs[2] == lrs[3] == lrs[4]
    assert lrs[5] == lrs[6] == lrs[7]
    assert lrs[4] != lrs[5]
    # Without the setting, every step advances.
    h.iterations_per_scheduler_step = None
    h.total_steps = 0
    a = h._current_lr()
    h.total_steps = 1
    assert h._current_lr() != a
    # No scheduler -> base lr.
    h.scheduler = None
    assert h._current_lr() == 1.0


def test_ema_shadow_converges():
    import jax.numpy as jnp
    from idiaptts_tpu.train.handler import ExponentialMovingAverage
    params = {"w": jnp.zeros(3)}
    ema = ExponentialMovingAverage(params, decay=0.5)
    target = {"w": jnp.ones(3)}
    for _ in range(20):
        ema.update(target)
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]),
                               np.ones(3), atol=1e-5)
