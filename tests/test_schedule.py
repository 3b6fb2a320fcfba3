"""ReduceLROnPlateau semantics (reference keras_ports.py:7-123, whose
__main__ block scripted exactly this scenario and eyeballed the result)."""

import pytest

from terrain_tpu.train.optim import Optimizer, get_optimizer
from terrain_tpu.train.schedule import ReduceLROnPlateau


def test_reduce_on_plateau_scenario():
    # the reference's smoke scenario: improve 3 epochs, stagnate 9 -> reduce
    cb = ReduceLROnPlateau(factor=0.1, patience=10)
    lr = 0.01
    for epoch, monitor in enumerate([1.45, 1.43, 1.41] + [1.41] * 9, start=1):
        lr = cb.step(lr, monitor, epoch)
    assert lr == pytest.approx(0.01)  # patience not yet exceeded
    for epoch in range(13, 16):
        lr = cb.step(lr, 1.41, epoch)
    assert lr == pytest.approx(0.001)  # reduced once by factor


def test_reduce_respects_min_lr_and_cooldown():
    cb = ReduceLROnPlateau(factor=0.5, patience=1, cooldown=2, min_lr=1e-3)
    lr = 2e-3
    for epoch in range(1, 12):
        lr = cb.step(lr, 1.0, epoch)  # stagnant forever
    assert lr >= 1e-3


def test_factor_ge_1_rejected():
    with pytest.raises(ValueError):
        ReduceLROnPlateau(factor=1.5)


def test_get_optimizer_passthrough_and_unknown():
    opt = get_optimizer("rmsprop", {"learning_rate": 1e-4})
    assert isinstance(opt, Optimizer) and opt.default_lr == 1e-4
    assert get_optimizer(opt) is opt
    with pytest.raises(KeyError):
        get_optimizer("sgdd")
