"""Runnable UPerNet semantic segmentation on the ConvNeXt pyramid backbone.

The reference vendors the facebookresearch/ConvNeXt `semantic_segmentation/`
dir as *configs only* — the model dict at
`semantic_segmentation/configs/_base_/models/upernet_convnext.py:10-49`
(UPerHead pool_scales (1,2,3,6), channels 512, dropout 0.1, SyncBN,
align_corners=False; FCNHead aux on stage index 2, channels 256, num_convs 1,
loss weight 0.4) plus per-size recipes, and defers execution to an external
mmsegmentation checkout (`semantic_segmentation/README.md:11-12`). This module
makes that capability runnable, TPU-first:

* the decode heads are flax modules over the repo's own `features_only`
  ConvNeXt (the same per-stage-LayerNormed maps the reference backbone
  registers, `backbone/convnext.py:100-108`);
* "SyncBN" is plain `nn.BatchNorm` — under pjit the batch axis is sharded
  over the mesh and XLA makes the stat reduction global, so BN *is* SyncBN
  here, no wrapper needed;
* bilinear resizes use `jax.image.resize`, whose half-pixel-center sampling
  matches mmseg's `align_corners=False`;
* everything is static-shaped: pool scales, crop sizes and the class count
  are trace-time constants, so one compile serves the whole run.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize (mmseg align_corners=False semantics)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear")


class ConvModule(nn.Module):
    """mmcv ConvModule(conv → BN → ReLU), NHWC."""

    channels: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (self.kernel, self.kernel), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class PPM(nn.Module):
    """Pyramid Pooling Module (UPerHead psp_modules): adaptive-average-pool the
    stride-32 map to each `scale`, 1x1 ConvModule to `channels`, upsample back,
    concat with the input, fuse with a 3x3 ConvModule (mmseg UPerHead
    bottleneck). Pool scales per the reference config (upernet_convnext.py:26)."""

    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            # adaptive average pool to an s x s grid: mean over equal bins
            # (H, W are multiples of s for crop sizes divisible by 32*s;
            # otherwise fall back to the exact torch bin edges)
            p = _adaptive_avg_pool(x, s)
            p = ConvModule(self.channels, 1, dtype=self.dtype,
                           name=f"pool{i}")(p, train=train)
            outs.append(_resize(p, (H, W)))
        y = jnp.concatenate(outs, axis=-1)
        return ConvModule(self.channels, 3, dtype=self.dtype,
                          name="bottleneck")(y, train=train)


def _adaptive_avg_pool(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d(s) on NHWC: bin i spans
    [floor(i*H/s), ceil((i+1)*H/s)) — exact for any H, static shapes."""
    B, H, W, C = x.shape
    if H % s == 0 and W % s == 0:
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, H // s, W // s, 1), (1, H // s, W // s, 1), "VALID",
        ) / float((H // s) * (W // s))
    rows = []
    for i in range(s):
        r0, r1 = (i * H) // s, -(-((i + 1) * H) // s)
        cols = []
        for j in range(s):
            c0, c1 = (j * W) // s, -(-((j + 1) * W) // s)
            cols.append(x[:, r0:r1, c0:c1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class UPerHead(nn.Module):
    """mmseg UPerHead: PPM on the top feature, 1x1 lateral convs, top-down FPN
    sum, per-level 3x3 convs, upsample-all-to-1/4 concat, 3x3 fuse, dropout,
    1x1 classifier (reference config upernet_convnext.py:22-33)."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        conv = partial(ConvModule, dtype=self.dtype)
        laterals = [
            conv(self.channels, 1, name=f"lateral{i}")(f, train=train)
            for i, f in enumerate(feats[:-1])
        ]
        laterals.append(
            PPM(self.channels, self.pool_scales, dtype=self.dtype,
                name="ppm")(feats[-1], train=train)
        )
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            conv(self.channels, 3, name=f"fpn{i}")(laterals[i], train=train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        hw = outs[0].shape[1:3]
        y = jnp.concatenate([_resize(o, hw) for o in outs], axis=-1)
        y = conv(self.channels, 3, name="fuse")(y, train=train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(y)


class FCNHead(nn.Module):
    """mmseg FCNHead (num_convs=1, concat_input=False): one 3x3 ConvModule then
    the 1x1 classifier; attached to the stride-16 stage (in_index=2, aux loss
    weight 0.4 — upernet_convnext.py:34-46)."""

    num_classes: int
    channels: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.channels, 3, dtype=self.dtype,
                       name="conv0")(x, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)


class UPerNet(nn.Module):
    """EncoderDecoder(backbone=ConvNeXt features_only, decode=UPerHead,
    aux=FCNHead). Returns (main_logits, aux_logits) at input resolution,
    fp32 (mmseg resizes logits to label size before the loss)."""

    backbone: nn.Module               # features_only ConvNeXt (strides 4-32)
    num_classes: int = 150
    channels: int = 512
    aux_head: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        feats = self.backbone(x, train=train)
        main = UPerHead(self.num_classes, self.channels, dtype=self.dtype,
                        name="decode_head")(feats, train=train)
        main = _resize(main.astype(jnp.float32), hw)
        if not self.aux_head:
            return main, None
        aux = FCNHead(self.num_classes, dtype=self.dtype,
                      name="auxiliary_head")(feats[2], train=train)
        return main, _resize(aux.astype(jnp.float32), hw)


def build_upernet(config_name: str, num_classes: int,
                  half_precision: bool = False):
    """Build a UPerNet from a reference recipe name (downstream.configs
    SEGMENTATION_CONFIGS). Returns (model, config)."""
    from ..models import create_model
    from .configs import SEGMENTATION_CONFIGS

    cfg = SEGMENTATION_CONFIGS[config_name]
    backbone = create_model(
        cfg.backbone, num_classes=0, features_only=True,
        out_indices=(0, 1, 2, 3), drop_path_rate=cfg.drop_path_rate,
        half_precision=half_precision,
    )
    model = UPerNet(
        backbone=backbone, num_classes=num_classes, aux_head=cfg.aux_head,
        dtype=jnp.bfloat16 if half_precision else jnp.float32,
    )
    return model, cfg
