"""EfficientNet B0-B4 (NHWC, flax.linen) — timm-layout parity.

The reference reaches this family through `timm.create_model`
(/root/reference/train.py:194); this is a from-scratch TPU-native
implementation of timm's `efficientnet_b{0..4}` (non-TF variants: static
symmetric padding, BN eps 1e-5), so timm hub state_dicts convert directly
(checkpoint/torch_convert.convert_efficientnet).

Architecture: MBConv inverted residuals with SE (reduce channels =
block-INPUT channels * 0.25, sigmoid gate, SiLU everywhere), stochastic
depth scaled linearly over block index, compound width/depth scaling with
the canonical round-to-8 channel rounding.

TPU notes: same regime as mobilenetv3 — depthwise convs are
bandwidth-bound and XLA fuses BN+SiLU epilogues into them; SE runs as two
Dense layers on the pooled vector; bf16 compute with fp32
params/statistics.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import make_divisible

Dtype = Any


# timm round_channels (same rule as torchvision _make_divisible)
round_channels = make_divisible


# b0 base stage table: (kernel, stride, expand_ratio, out_ch, repeats)
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (3, 1, 1, 16, 1),    # stage 0: depthwise-separable (no expansion conv)
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
)

# (width_mult, depth_mult) per variant — resolution is a training choice,
# not a model parameter (any --input_size works)
_VARIANTS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
}


class MBConv(nn.Module):
    """timm InvertedResidual / DepthwiseSeparableConv (expand_ratio == 1).

    SE reduce width = max(1, block_in * 0.25) — computed from the block's
    INPUT channels, applied to the EXPANDED features (timm semantics)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        mid = self.in_ch * self.expand
        residual = x
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_pw")(y)
            y = jax.nn.silu(norm("bn_pw")(y))
        pad = (self.kernel - 1) // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(y)
        y = jax.nn.silu(norm("bn_dw")(y))
        rd = max(1, int(self.in_ch * 0.25))
        s = y.mean(axis=(1, 2))
        s = jax.nn.silu(nn.Dense(rd, dtype=self.dtype, name="se_reduce")(s))
        s = jax.nn.sigmoid(nn.Dense(mid, dtype=self.dtype, name="se_expand")(s))
        y = y * s[:, None, None, :]
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = norm("bn_pwl")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
                )
                y = y * mask.astype(y.dtype) / keep
            y = y + residual
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    drop_rate: float = 0.2
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def _cfg(self) -> Sequence[Tuple[int, int, int, int, int, int]]:
        """Expanded per-block list: (in, out, kernel, stride, expand, idx)."""
        blocks = []
        cin = round_channels(32 * self.width_mult)
        for k, s, e, c, r in _B0_STAGES:
            cout = round_channels(c * self.width_mult)
            repeats = int(math.ceil(r * self.depth_mult))
            for j in range(repeats):
                blocks.append((cin, cout, k, s if j == 0 else 1, e))
                cin = cout
        return blocks

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        stem = round_channels(32 * self.width_mult)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = jax.nn.silu(norm("bn_stem")(x))
        blocks = self._cfg()
        n = len(blocks)
        for i, (cin, cout, k, s, e) in enumerate(blocks):
            x = MBConv(cin, cout, k, s, e,
                       drop_path=self.drop_path_rate * i / n,
                       dtype=self.dtype, name=f"block_{i}")(x, train=train)
        head = round_channels(1280 * self.width_mult)
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = jax.nn.silu(norm("bn_head")(x))
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def _make(name):
    w, d = _VARIANTS[name]

    def ctor(num_classes=1000, dtype=jnp.float32, drop_rate=0.2,
             drop_path_rate=0.0, **kw):
        return EfficientNet(w, d, num_classes=num_classes,
                            drop_rate=drop_rate,
                            drop_path_rate=drop_path_rate, dtype=dtype)

    ctor.__name__ = name
    return ctor


efficientnet_b0 = _make("efficientnet_b0")
efficientnet_b1 = _make("efficientnet_b1")
efficientnet_b2 = _make("efficientnet_b2")
efficientnet_b3 = _make("efficientnet_b3")
efficientnet_b4 = _make("efficientnet_b4")
