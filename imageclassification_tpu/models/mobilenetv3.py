"""MobileNetV3 family (NHWC, flax.linen) — torchvision-parity.

The reference reaches this family through `timm.create_model`
(/root/reference/train.py:194); this is a from-scratch TPU-native
implementation of the torchvision `mobilenet_v3_{large,small}` spec
(inverted-residual table from torchvision/models/mobilenetv3.py
`_mobilenet_v3_conf`) so hub state_dicts convert directly
(checkpoint/torch_convert.convert_mobilenetv3).

TPU notes: NHWC convs throughout; the depthwise 3x3/5x5 convs are
bandwidth-bound and XLA fuses the BN+hardswish epilogues into them
(measured in benchmarks/dwconv_bench.json — a hand Pallas dwconv loses);
squeeze-excite runs as two Dense layers on the pooled vector, keeping the
gating math in registers. bf16 compute with fp32 params/statistics like
the rest of the zoo.

BatchNorm eps=1e-3 matches torchvision (weight/layout parity); momentum
keeps torch's default 0.1 (flax 0.9) like timm's mobilenetv3 — the model
the reference actually instantiates — rather than torchvision's 0.01,
whose running stats need thousands of steps to adapt.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import make_divisible

Dtype = Any


# torchvision _make_divisible (shared with EfficientNet's round_channels)
_make_divisible = make_divisible


class BlockCfg(NamedTuple):
    in_ch: int
    kernel: int
    expanded: int
    out_ch: int
    use_se: bool
    use_hs: bool   # hardswish (True) vs relu (False)
    stride: int


# torchvision _mobilenet_v3_conf tables (kernel, exp, out, SE, act, stride)
_LARGE = [
    BlockCfg(16, 3, 16, 16, False, False, 1),
    BlockCfg(16, 3, 64, 24, False, False, 2),
    BlockCfg(24, 3, 72, 24, False, False, 1),
    BlockCfg(24, 5, 72, 40, True, False, 2),
    BlockCfg(40, 5, 120, 40, True, False, 1),
    BlockCfg(40, 5, 120, 40, True, False, 1),
    BlockCfg(40, 3, 240, 80, False, True, 2),
    BlockCfg(80, 3, 200, 80, False, True, 1),
    BlockCfg(80, 3, 184, 80, False, True, 1),
    BlockCfg(80, 3, 184, 80, False, True, 1),
    BlockCfg(80, 3, 480, 112, True, True, 1),
    BlockCfg(112, 3, 672, 112, True, True, 1),
    BlockCfg(112, 5, 672, 160, True, True, 2),
    BlockCfg(160, 5, 960, 160, True, True, 1),
    BlockCfg(160, 5, 960, 160, True, True, 1),
]
_SMALL = [
    BlockCfg(16, 3, 16, 16, True, False, 2),
    BlockCfg(16, 3, 72, 24, False, False, 2),
    BlockCfg(24, 3, 88, 24, False, False, 1),
    BlockCfg(24, 5, 96, 40, True, True, 2),
    BlockCfg(40, 5, 240, 40, True, True, 1),
    BlockCfg(40, 5, 240, 40, True, True, 1),
    BlockCfg(40, 5, 120, 48, True, True, 1),
    BlockCfg(48, 5, 144, 48, True, True, 1),
    BlockCfg(48, 5, 288, 96, True, True, 2),
    BlockCfg(96, 5, 576, 96, True, True, 1),
    BlockCfg(96, 5, 576, 96, True, True, 1),
]


class InvertedResidual(nn.Module):
    cfg: BlockCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        act = jax.nn.hard_swish if c.use_hs else jax.nn.relu
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = x
        if c.expanded != c.in_ch:
            y = nn.Conv(c.expanded, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = act(norm("expand_bn")(y))
        pad = (c.kernel - 1) // 2
        y = nn.Conv(c.expanded, (c.kernel, c.kernel),
                    strides=(c.stride, c.stride), padding=pad,
                    feature_group_count=c.expanded, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(y)
        y = act(norm("dw_bn")(y))
        if c.use_se:
            # torchvision SqueezeExcitation: squeeze = in//4 rounded to 8,
            # relu then HARDsigmoid gate; 1x1 convs implemented as Dense on
            # the pooled vector
            squeeze = _make_divisible(c.expanded // 4)
            s = y.mean(axis=(1, 2))
            s = nn.relu(nn.Dense(squeeze, dtype=self.dtype, name="se_fc1")(s))
            s = jax.nn.hard_sigmoid(
                nn.Dense(c.expanded, dtype=self.dtype, name="se_fc2")(s)
            )
            y = y * s[:, None, None, :]
        y = nn.Conv(c.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm("project_bn")(y)
        if c.stride == 1 and c.in_ch == c.out_ch:
            y = y + residual
        return y


class MobileNetV3(nn.Module):
    cfgs: Sequence[BlockCfg]
    last_channel: int            # classifier hidden width (1280 / 1024)
    num_classes: int = 1000
    drop_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = jax.nn.hard_swish(norm("stem_bn")(x))
        for i, c in enumerate(self.cfgs):
            x = InvertedResidual(c, dtype=self.dtype, name=f"block_{i}")(
                x, train=train
            )
        last_conv = 6 * self.cfgs[-1].out_ch
        x = nn.Conv(last_conv, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_last")(x)
        x = jax.nn.hard_swish(norm("bn_last")(x))
        x = x.mean(axis=(1, 2))
        x = jax.nn.hard_swish(
            nn.Dense(self.last_channel, dtype=self.dtype, name="pre_head")(x)
        )
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def mobilenetv3_large_100(num_classes=1000, dtype=jnp.float32,
                          drop_rate=0.2, **kw):
    return MobileNetV3(_LARGE, 1280, num_classes=num_classes,
                       drop_rate=drop_rate, dtype=dtype)


def mobilenetv3_small_100(num_classes=1000, dtype=jnp.float32,
                          drop_rate=0.2, **kw):
    return MobileNetV3(_SMALL, 1024, num_classes=num_classes,
                       drop_rate=drop_rate, dtype=dtype)


# torchvision-style aliases
mobilenet_v3_large = mobilenetv3_large_100
mobilenet_v3_small = mobilenetv3_small_100
