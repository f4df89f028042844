"""Schedule arrays vs closed form (SURVEY §4 point 1, reference utils.py:471-534)."""

import math

import numpy as np

from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.optim.schedules import (
    build_schedules,
    cosine_scheduler,
    linear_scheduler,
    piecewise_scheduler,
)


def test_cosine_length_and_endpoints():
    s = cosine_scheduler(1e-3, 1e-6, epochs=10, niter_per_ep=20, warmup_epochs=2)
    assert len(s) == 200
    assert s[0] == 0.0  # warmup starts at start_warmup_value=0
    assert abs(s[39] - 1e-3) < 1e-9  # warmup ends at base (np.linspace inclusive)
    # first post-warmup value: cos(0) → base
    assert abs(s[40] - 1e-3) < 1e-12
    # closed form check mid-way
    i = 60  # post-warmup iter 20 of 160
    expected = 1e-6 + 0.5 * (1e-3 - 1e-6) * (1 + math.cos(math.pi * 20 / 160))
    assert abs(s[i] - expected) < 1e-12


def test_cosine_warmup_steps_override():
    s = cosine_scheduler(1.0, 0.0, epochs=2, niter_per_ep=50, warmup_epochs=1, warmup_steps=10)
    assert len(s) == 100
    assert abs(s[9] - 1.0) < 1e-9  # warmup ends after 10 steps, not 50


def test_linear_scheduler():
    s = linear_scheduler(1.0, 0.0, epochs=1, niter_per_ep=100)
    assert len(s) == 100
    assert s[0] == 1.0 and abs(s[50] - 0.5) < 1e-12


def test_piecewise_scheduler():
    s = piecewise_scheduler(1.0, 0.0, epochs=1, niter_per_ep=100, milestones=[10, 20], gamma=0.5)
    assert len(s) == 100
    assert s[9] == 1.0 and abs(s[10] - 0.5) < 1e-12 and abs(s[20] - 0.25) < 1e-12


def test_build_schedules_wd_cosine():
    cfg = TrainConfig(epochs=4, warmup_epochs=1)
    lr, wd = build_schedules(cfg, niter_per_ep=10)
    assert len(lr) == 40 and len(wd) == 40
    assert abs(wd[0] - cfg.weight_decay) < 1e-12
    assert abs(wd[-1] - cfg.weight_decay_end) < 1e-6
