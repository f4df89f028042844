"""Config/CLI parity tests (reference C1 flags, train.py:32-107)."""

import pytest

from imageclassification_tpu.config import TrainConfig, parse_args, str2bool

REFERENCE_FLAGS = [
    "batch_size", "epochs", "update_freq", "pretrained", "model", "drop_path",
    "input_size", "model_ema", "opt", "opt_eps", "opt_betas", "clip_grad",
    "weight_decay", "weight_decay_end", "lr", "min_lr", "warmup_epochs",
    "warmup_steps", "RASampler", "color_jitter", "aa", "smoothing", "reprob",
    "remode", "recount", "resplit", "mixup", "cutmix", "cutmix_minmax",
    "mixup_prob", "mixup_switch_prob", "mixup_mode", "data_path",
    "train_split_rato", "device", "seed", "resume", "auto_resume", "save_ckpt",
    "save_ckpt_freq", "save_ckpt_num", "start_epoch", "eval", "num_workers",
    "use_amp", "world_size", "local_rank", "dist_on_itp", "dist_url",
    "enable_wandb", "project", "wandb_ckpt",
]


def test_all_reference_flags_exist():
    cfg = TrainConfig()
    for flag in REFERENCE_FLAGS:
        assert hasattr(cfg, flag), f"missing reference flag {flag}"


def test_reference_defaults():
    cfg = TrainConfig()
    assert cfg.batch_size == 64 and cfg.epochs == 100 and cfg.update_freq == 1
    assert cfg.model == "efficientvit_m0" and cfg.drop_path == 0.05
    assert cfg.opt == "adamw" and cfg.lr == 1e-3 and cfg.weight_decay == 5e-4
    assert cfg.mixup == 0.8 and cfg.cutmix == 0.0 and cfg.smoothing == 0.1
    assert cfg.seed == 88 and cfg.train_split_rato == 0.9


def test_parse_args_round_trip():
    cfg = parse_args(["--batch_size", "8", "--model_ema", "true", "--aa", "rand-m9-mstd0.5-inc1"])
    assert cfg.batch_size == 8 and cfg.model_ema is True
    assert cfg.aa == "rand-m9-mstd0.5-inc1"
    d = cfg.to_dict()
    cfg2 = TrainConfig.from_dict(d)
    assert cfg2 == cfg


def test_str2bool():
    assert str2bool("yes") and str2bool("1") and not str2bool("f")
    with pytest.raises(Exception):
        str2bool("maybe")


def test_opt_betas_nargs():
    cfg = parse_args(["--opt_betas", "0.9", "0.99"])
    assert cfg.opt_betas == [0.9, 0.99]
