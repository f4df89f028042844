"""Config / flag system (reference C1: train.py:32-107 `get_args_parser`).

The reference exposes ~45 argparse flags and mutates the args namespace as runtime
state (rank/world_size/distributed injected by utils.py:339-366). We keep the exact
flag names and defaults, but back them with a dataclass so the config can round-trip
through checkpoints (reference persists `args` inside checkpoints, utils.py:548).

TPU-specific extras are appended at the end (mesh/fsdp/precision/profiling); they
default to values that reproduce the reference behavior.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional


def str2bool(v) -> bool:
    """Boolean flag coercion (reference train.py:21-29)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


@dataclass
class TrainConfig:
    # ---- batching (reference train.py:36-38) ----
    batch_size: int = 64          # per-process batch size
    epochs: int = 100
    update_freq: int = 1          # gradient accumulation steps

    # ---- model (reference train.py:40-43) ----
    pretrained: bool = True
    model: str = "efficientvit_m0"
    drop_path: float = 0.05
    input_size: int = 224

    # ---- EMA (reference train.py:45; decay hardcoded 0.9995 at train.py:201) ----
    model_ema: bool = False
    model_ema_decay: float = 0.9995
    # Decay warmup (timm ModelEmaV3's use_warmup semantics — the reference
    # leaves it off, train.py:201): effective decay at real update t is
    # min(decay, (1+t)/(10+t)), the TF/Adam-style debiasing ramp. Removes the
    # init-weight contamination that otherwise makes EMA lag raw accuracy by
    # ~1/(1-decay) updates on short-horizon runs (see benchmarks/results.json
    # c5_rasampler_digits forensics). Off by default for reference parity.
    model_ema_warmup: bool = False

    # ---- optimization (reference train.py:48-57) ----
    opt: str = "adamw"
    opt_eps: float = 1e-8
    opt_betas: Optional[List[float]] = None
    clip_grad: Optional[float] = None
    weight_decay: float = 5e-4
    weight_decay_end: float = 5e-6
    lr: float = 1e-3
    min_lr: float = 1e-6
    warmup_epochs: int = 5
    warmup_steps: int = -1

    # ---- augmentation (reference train.py:60-63) ----
    RASampler: bool = False
    color_jitter: float = 0.3
    aa: str = ""                  # '', 'v0', 'original', or 'rand-m9-mstd0.5-inc1'
    smoothing: float = 0.1

    # ---- random erasing (reference train.py:66-69) ----
    reprob: float = 0.25
    remode: str = "pixel"
    recount: int = 1
    resplit: bool = False

    # ---- mixup/cutmix (reference train.py:72-77) ----
    mixup: float = 0.8
    cutmix: float = 0.0
    cutmix_minmax: Optional[List[float]] = None
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"     # 'batch', 'pair', or 'elem'

    # ---- dataset / run control (reference train.py:80-93) ----
    data_path: str = "../../datas/CatsDogs_mini"
    train_split_rato: float = 0.9  # 0 => manual train/ + val/ dirs (sic: reference spelling)
    device: str = "tpu"            # reference default 'cuda'; here 'tpu'|'cpu'
    seed: int = 88
    resume: str = ""
    auto_resume: bool = True
    save_ckpt: bool = True
    save_ckpt_freq: int = 1
    save_ckpt_num: int = 999
    start_epoch: int = 0
    eval: bool = False
    num_workers: int = 32
    use_amp: bool = False          # on TPU: bfloat16 compute path

    # ---- distributed (reference train.py:96-99) ----
    world_size: int = 1
    local_rank: int = -1
    dist_on_itp: bool = False
    dist_url: str = "env://"

    # ---- W&B (reference train.py:103-105) ----
    enable_wandb: bool = False
    project: str = "classification"
    wandb_ckpt: bool = False

    # ---- TPU-native extras (no reference equivalent) ----
    output_dir: str = "train_cls/output"   # reference hardcodes this path (train.py:415)
    log_dir: str = "train_cls/log_dir"     # reference hardcodes (train.py:142)
    mesh_shape: str = ""          # e.g. 'data:8' or 'data:4,fsdp:2'; '' = all devices on 'data'
    fsdp: bool = False            # shard params over the data axis (ZeRO-3 style)
    layer_decay: float = 1.0      # layer-wise LR decay rate (reference D3 semantics; 1.0 = off)
    lr_scheduler: str = "cosine"  # cosine | linear | piecewise (reference utils.py:471-534)
    check_nans: bool = False      # jax.debug_nans equivalent (SURVEY §5.2)
    profile_dir: str = ""         # capture a jax.profiler trace into this dir if set
    pretrained_path: str = ""     # local pretrained weights (no network egress on TPU pods)
    half_precision: bool = True   # bf16 activations/compute (params stay fp32)
    remat: bool = False           # jax.checkpoint the forward (trade FLOPs for HBM)
    flash_attn: bool = False      # Pallas TPU flash attention for ViT (wins at ~1k+ tokens)
    swin_attn_layout: str = "merged"  # Swin window-attention layout: merged (TPU, round 5) | legacy (timm dataflow)
    # 'exact' reproduces the reference's mixup-mode train accuracy (a second
    # no-grad forward on the un-mixed batch, engine.py:89-97 — measured at
    # ~24% of step time); 'mixed' reads accuracy off the mixed-batch logits
    # against the hard labels (free, slightly pessimistic)
    train_acc_mode: str = "exact"
    # grad-norm measurement norm type (reference get_grad_norm_ supports
    # norm_type=2.0 or inf, utils.py:456-468); affects the REPORTED
    # grad_norm metric only — clipping is always by global L2 norm like
    # torch clip_grad_norm_'s default (utils.py:437-440)
    grad_norm_type: float = 2.0   # 2.0 or float('inf') via --grad_norm_type inf
    # ---- knowledge distillation (beyond reference: its README todo #5) ----
    # teacher_path: a repo checkpoint; the teacher is rebuilt from its own
    # model_spec and runs an eval-mode forward inside the jit step.
    # loss = (1-alpha)*base + alpha * tau^2 * KL(teacher/tau || student/tau)
    teacher_path: str = ""
    distillation_alpha: float = 0.0
    distillation_tau: float = 1.0
    # prune_mask: sparse fine-tune for modelchange.py --mode prune outputs —
    # captures the loaded weights' zero pattern (prune_model's kernel
    # eligibility) and re-applies it after every optimizer update, so the
    # pruned sparsity survives fine-tuning instead of densifying
    prune_mask: bool = False

    # ---- runtime state injected at startup (reference utils.py:339-366) ----
    rank: int = 0
    distributed: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


_RUNTIME_FIELDS = {"rank", "distributed"}


def get_args_parser() -> argparse.ArgumentParser:
    """Build an argparse parser from the dataclass (flag names match the reference)."""
    parser = argparse.ArgumentParser(
        "Training and evaluation script for image classification (TPU-native)",
        add_help=False,
    )
    for f in dataclasses.fields(TrainConfig):
        if f.name in _RUNTIME_FIELDS:
            continue
        name = "--" + f.name
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.type in ("bool", bool):
            parser.add_argument(name, type=str2bool, default=default)
        elif f.name in ("opt_betas", "cutmix_minmax"):
            parser.add_argument(name, type=float, nargs="+", default=default)
        elif f.name == "clip_grad":
            parser.add_argument(name, type=float, default=default)
        elif f.type in ("int", int):
            parser.add_argument(name, type=int, default=default)
        elif f.type in ("float", float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def parse_args(argv=None) -> TrainConfig:
    parser = argparse.ArgumentParser(
        "Classification training and evaluation script", parents=[get_args_parser()]
    )
    ns = parser.parse_args(argv)
    return TrainConfig(**vars(ns))
