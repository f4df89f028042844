"""Model registry (reference C7: timm create_model at train.py:194 with
per-family kwarg routing at train.py:189-192: efficientvit* takes drop_rate,
convnext* takes drop_path_rate)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from . import convnext, densenet, efficientnet, efficientvit, mobilenetv3, resnet, swin, vit

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, ctor: Callable) -> None:
    _REGISTRY[name] = ctor


def list_models():
    return sorted(_REGISTRY)


for _n in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
           "resnext50_32x4d", "resnext101_32x8d",
           "wide_resnet50_2", "wide_resnet101_2"):
    register(_n, getattr(resnet, _n))
for _n in ("convnext_atto", "convnext_femto", "convnext_pico", "convnext_nano",
           "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
           "convnext_xlarge",
           "convnextv2_atto", "convnextv2_femto", "convnextv2_pico",
           "convnextv2_nano", "convnextv2_tiny", "convnextv2_base",
           "convnextv2_large", "convnextv2_huge"):
    register(_n, getattr(convnext, _n))
for _n in ("vit_tiny_patch16", "vit_small_patch16", "vit_small_patch32",
           "vit_base_patch16", "vit_base_patch32", "vit_large_patch16"):
    register(_n, getattr(vit, _n))
    # timm-style aliases with input-size suffix
    register(_n + "_224", getattr(vit, _n))
for _n in ("efficientvit_m0", "efficientvit_m1", "efficientvit_m2",
           "efficientvit_m3", "efficientvit_m4", "efficientvit_m5"):
    register(_n, getattr(efficientvit, _n))
for _n in ("mobilenetv3_large_100", "mobilenetv3_small_100",
           "mobilenet_v3_large", "mobilenet_v3_small"):
    register(_n, getattr(mobilenetv3, _n))
for _n in ("efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
           "efficientnet_b3", "efficientnet_b4"):
    register(_n, getattr(efficientnet, _n))
for _n in ("swin_tiny_patch4_window7_224", "swin_small_patch4_window7_224",
           "swin_base_patch4_window7_224"):
    register(_n, getattr(swin, _n))
    register(_n.replace("_patch4_window7_224", ""), getattr(swin, _n))
for _n in ("densenet121", "densenet169", "densenet201"):
    register(_n, getattr(densenet, _n))


def create_model(
    name: str,
    pretrained: bool = False,
    num_classes: int = 1000,
    half_precision: bool = False,
    **kwargs: Any,
):
    """Build a model by name. `pretrained=True` loads local weights when a
    `pretrained_path` kwarg points at a checkpoint (TPU pods have no network
    egress; the reference downloads through timm's hub instead) — the actual
    loading with mismatched-layer pruning happens in checkpoint.io."""
    if name not in _REGISTRY:
        raise ValueError(f"Unknown model {name!r}. Available: {list_models()}")
    kwargs.pop("pretrained_path", None)
    dtype = jnp.bfloat16 if half_precision else jnp.float32
    return _REGISTRY[name](num_classes=num_classes, dtype=dtype, **kwargs)


def model_kwargs_for(args, num_classes: int) -> dict:
    """Per-family kwarg routing (reference train.py:187-192)."""
    kw: dict = {"pretrained": args.pretrained, "num_classes": num_classes}
    if args.model.startswith("efficientvit"):
        kw["drop_rate"] = args.drop_path
        kw["img_size"] = args.input_size
    elif args.model.startswith("convnext"):
        kw["drop_path_rate"] = args.drop_path
    elif args.model.startswith("vit") and getattr(args, "flash_attn", False):
        # Pallas TPU flash attention — measured to win 2-3x at ~1k+ tokens
        # (ViT at 1024² images), where the einsum path's materialized
        # attention matrices dominate; at 224²/384² XLA's einsum is faster
        # end-to-end (benchmarks/attention_bench_n*.json), hence opt-in
        kw["flash_attn"] = True
    elif args.model.startswith("swin"):
        # "merged" (default) = the round-5 TPU window-attention layout;
        # "legacy" = the per-window timm dataflow (same function/params —
        # benchmarks/swin_layout_bench.json)
        kw["attn_layout"] = getattr(args, "swin_attn_layout", "merged")
    return kw
