"""ResNet family (v1.5, NHWC, flax.linen).

The reference gets ResNets from `timm.create_model` (train.py:194); this is a
from-scratch TPU-native implementation: NHWC convs (XLA's preferred TPU layout),
BatchNorm whose statistics are computed over the GLOBAL sharded batch inside the
jit step (equivalent to SyncBN — the reference's DDP keeps per-replica stats),
and bf16 compute with fp32 params/statistics.

v1.5 (stride in the 3x3 of the bottleneck) matches timm/torchvision resnet50.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


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
        y = conv(self.filters, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), (self.strides, self.strides), padding=1)(y)
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
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
                    name="conv_stem")(x)
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
