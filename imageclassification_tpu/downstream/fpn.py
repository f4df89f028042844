"""Feature Pyramid Network neck (the reference detection configs' neck dict:
object_detection/configs/_base_/models/mask_rcnn_convnext_fpn.py:22-26 —
FPN(in_channels=backbone dims, out_channels=256, num_outs=5)).

mmdet FPN semantics reproduced exactly: 1x1 lateral convs on every backbone
level, top-down nearest-neighbor upsample + add, 3x3 output convs, and extra
levels beyond the backbone produced by stride-2 max-pool on the LAST output
(mmdet's default `add_extra_convs=False` path) — P2..P5 from strides 4-32
plus P6 at stride 64 for num_outs=5. Convs carry bias and no norm/act
(norm_cfg=None, act_cfg=None defaults), matching torchvision/mmdet FPN.

This makes the detection capability's backbone+neck runnable the same way
seg_train makes D7 runnable; the RPN/RoI heads remain config-intent (D6),
as in the reference, which defers them to an external mmdet checkout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: backbone maps, shallow→deep (strides 4/8/16/32, NHWC).
        Returns `num_outs` maps at `out_channels`, strides 4,8,...,
        extra levels max-pooled from the last."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            B, H, W, C = laterals[i - 1].shape
            up = jax.image.resize(laterals[i], (B, H, W, C), method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:  # P6(+): stride-2 max-pool of last
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


def build_detection_backbone(config_name: str, half_precision: bool = False):
    """(backbone, fpn, config) for a reference detection recipe name
    (downstream.configs DETECTION_CONFIGS): the runnable backbone+neck
    stack under the vendored Mask R-CNN / Cascade heads."""
    from .backbone import ConvNeXtBackbone
    from .configs import DETECTION_CONFIGS

    cfg = DETECTION_CONFIGS[config_name]
    backbone = ConvNeXtBackbone(
        variant=cfg.backbone, out_indices=(0, 1, 2, 3),
        drop_path_rate=cfg.drop_path_rate, half_precision=half_precision)
    fpn = FPN(out_channels=256, num_outs=5,
              dtype=jnp.bfloat16 if half_precision else jnp.float32)
    return backbone, fpn, cfg
