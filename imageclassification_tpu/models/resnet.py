"""ResNet family (v1.5, NHWC, flax.linen).

The reference gets ResNets from `timm.create_model` (train.py:194); this is a
from-scratch TPU-native implementation: NHWC convs (XLA's preferred TPU layout),
BatchNorm whose statistics are computed over the GLOBAL sharded batch inside the
jit step (equivalent to SyncBN — the reference's DDP keeps per-replica stats),
and bf16 compute with fp32 params/statistics.

v1.5 (stride in the 3x3 of the bottleneck) matches timm/torchvision resnet50.

Stem: the 7×7/s2 conv has 3 input channels — 3/128 MXU lanes filled. It is
executed as the mathematically-exact space-to-depth reformulation (input
re-tiled to H/2×W/2×12, kernel re-indexed to 4×4×12) whenever the input is
even-sized; the PARAMETER stays (7,7,3,64) so checkpoints and converted torch
weights are unaffected. See _space_to_depth_stem for the index algebra.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _space_to_depth_stem(x, kernel, dtype):
    """7×7/s2/pad-3 conv, executed as 4×4/s1 on the 2×2-space-to-depth input.

    out[i,j] = Σ_{u,v} x[2i+u-3, 2j+v-3]·k[u,v].  Writing the input row index
    as 2p+s (s = parity) gives u = 2(p-i)+s+3, so with u' = u+1 the kernel
    re-indexes as k'[q, s] = k_padded[2q+s] for q = p-i+2 ∈ [0,4): pad the
    7-tap axis by one zero IN FRONT, then split even/odd taps. Identical
    algebra on columns. Exact — not an approximation."""
    B, H, W, C = x.shape
    x2 = (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))      # [8,8,C,O]
    O = kernel.shape[-1]
    k4 = (
        k.reshape(4, 2, 4, 2, C, O)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * C, O)
    )
    return jax.lax.conv_general_dilated(
        x2.astype(dtype), k4.astype(dtype), (1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class StemConv(nn.Module):
    """Stem conv whose parameter keeps the standard (7,7,3,64) layout but whose
    execution uses the space-to-depth path on even-sized inputs (12 input
    lanes instead of 3 — the classic MLPerf ResNet TPU optimization)."""

    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return _space_to_depth_stem(x, kernel, self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal())
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (3, 3), (self.strides, self.strides), padding=1)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=1)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)  # zero-init last BN gamma
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck incl. the ResNeXt/wide generalization: the
    1x1-reduce and grouped 3x3 run at `int(filters * base_width/64) * groups`
    channels (torchvision resnet.py Bottleneck.__init__ width formula)."""

    filters: int
    strides: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal())
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        residual = x
        y = conv(width, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(width, (3, 3), (self.strides, self.strides), padding=1,
                 feature_group_count=self.groups)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1))(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: Callable
    num_classes: int = 1000
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = StemConv(self.width, dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_stem")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(self.width * 2**i, strides=strides,
                               dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def resnet18(num_classes=1000, dtype=jnp.float32, **kw):
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes=num_classes, dtype=dtype)


def resnet34(num_classes=1000, dtype=jnp.float32, **kw):
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes=num_classes, dtype=dtype)


def resnet50(num_classes=1000, dtype=jnp.float32, **kw):
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes=num_classes, dtype=dtype)


def resnet101(num_classes=1000, dtype=jnp.float32, **kw):
    return ResNet([3, 4, 23, 3], Bottleneck, num_classes=num_classes, dtype=dtype)


def resnet152(num_classes=1000, dtype=jnp.float32, **kw):
    return ResNet([3, 8, 36, 3], Bottleneck, num_classes=num_classes, dtype=dtype)


def resnext50_32x4d(num_classes=1000, dtype=jnp.float32, **kw):
    block = partial(Bottleneck, groups=32, base_width=4)
    return ResNet([3, 4, 6, 3], block, num_classes=num_classes, dtype=dtype)


def resnext101_32x8d(num_classes=1000, dtype=jnp.float32, **kw):
    block = partial(Bottleneck, groups=32, base_width=8)
    return ResNet([3, 4, 23, 3], block, num_classes=num_classes, dtype=dtype)


def wide_resnet50_2(num_classes=1000, dtype=jnp.float32, **kw):
    block = partial(Bottleneck, base_width=128)
    return ResNet([3, 4, 6, 3], block, num_classes=num_classes, dtype=dtype)


def wide_resnet101_2(num_classes=1000, dtype=jnp.float32, **kw):
    block = partial(Bottleneck, base_width=128)
    return ResNet([3, 4, 23, 3], block, num_classes=num_classes, dtype=dtype)
