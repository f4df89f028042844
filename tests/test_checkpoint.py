"""Checkpoint semantics (reference utils.py:536-615): mismatch pruning,
auto-resume scan, rolling retention, optimizer-restore gating."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.checkpoint.io import (
    _flatten,
    auto_load_model,
    find_latest_checkpoint,
    load_params_with_pruning,
    save_model,
    wait_for_pending_saves,
)
from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.engine.state import TrainState


def _mini_state(head_dim=3):
    params = {
        "backbone": {"kernel": jnp.arange(12.0).reshape(3, 4)},
        "head": {"kernel": jnp.ones((4, head_dim)), "bias": jnp.zeros((head_dim,))},
    }
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats={},
        opt_state={"momentum": jax.tree.map(jnp.zeros_like, params)},
    )


def test_pruning_keeps_matching_drops_mismatched(capsys):
    src = _mini_state(head_dim=5)   # pretrained on 5 classes
    dst = _mini_state(head_dim=3)   # fine-tune to 3 classes
    flat = _flatten(src.params)
    new_params, missing = load_params_with_pruning(dst.params, flat)
    out = capsys.readouterr().out
    # head mismatches (4,5)≠(4,3) and (5,)≠(3,) → pruned with prints
    assert missing == 2
    assert out.count("Skipping mismatched key:") == 2
    # backbone transferred
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["kernel"]),
        np.arange(12.0).reshape(3, 4),
    )
    # head kept its random init
    np.testing.assert_array_equal(
        np.asarray(new_params["head"]["kernel"]), np.ones((4, 3))
    )


def test_save_find_latest_and_rolling_retention(tmp_path):
    cfg = TrainConfig(output_dir=str(tmp_path), save_ckpt_num=2, save_ckpt_freq=1)
    state = _mini_state()
    spec = {"name": "resnet18", "kwargs": {}}
    for epoch in range(5):
        save_model(cfg, [1, 16, 16, 3], epoch, state, 3, spec)
    wait_for_pending_saves()  # saves are async (write thread)
    # retention: epoch - 2*1 deleted → only the last 3 remain (plus none older)
    remaining = sorted(os.listdir(tmp_path))
    assert "checkpoint-4.pth" in remaining and "checkpoint-0.pth" not in remaining
    assert find_latest_checkpoint(str(tmp_path)).endswith("checkpoint-4.pth")
    # 'best' never deleted and never chosen by auto-resume
    save_model(cfg, [1, 16, 16, 3], "best", state, 3, spec)
    wait_for_pending_saves()
    assert find_latest_checkpoint(str(tmp_path)).endswith("checkpoint-4.pth")


def test_auto_resume_full_match_restores_optimizer(tmp_path):
    cfg = TrainConfig(output_dir=str(tmp_path), model_ema=False)
    state = _mini_state()
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        params=jax.tree.map(lambda p: p + 1.0, state.params),
    )
    save_model(cfg, [1, 16, 16, 3], 3, state, 3, {"name": "x", "kwargs": {}})

    fresh = _mini_state()
    cfg2 = TrainConfig(output_dir=str(tmp_path))
    loaded, ck = auto_load_model(cfg2, fresh)
    assert cfg2.start_epoch == 4            # epoch+1 (reference utils.py:607)
    assert int(loaded.step) == 7
    np.testing.assert_array_equal(
        np.asarray(loaded.params["backbone"]["kernel"]),
        np.arange(12.0).reshape(3, 4) + 1.0,
    )


def test_auto_resume_partial_match_skips_optimizer(tmp_path):
    cfg = TrainConfig(output_dir=str(tmp_path))
    big = _mini_state(head_dim=5)
    save_model(cfg, [1, 16, 16, 3], 2, big, 5, {"name": "x", "kwargs": {}})

    small = _mini_state(head_dim=3)
    cfg2 = TrainConfig(output_dir=str(tmp_path))
    loaded, ck = auto_load_model(cfg2, small)
    # mismatch → no optimizer/epoch restore (reference utils.py:605-614)
    assert cfg2.start_epoch == 0
    assert int(loaded.step) == 0


def test_resume_best_requires_eval(tmp_path):
    cfg = TrainConfig(output_dir=str(tmp_path))
    state = _mini_state()
    save_model(cfg, [1, 16, 16, 3], "best", state, 3, {"name": "x", "kwargs": {}})
    cfg2 = TrainConfig(
        output_dir=str(tmp_path),
        resume=str(tmp_path / "checkpoint-best.pth"),
        eval=False,
        auto_resume=False,
    )
    with pytest.raises(AssertionError):
        auto_load_model(cfg2, _mini_state())
