"""DenseNet family (NHWC, flax.linen) — torchvision-parity.

The reference reaches this family through `timm.create_model`
(/root/reference/train.py:194); this is a from-scratch TPU-native
implementation of the torchvision `densenet{121,169,201}` spec so hub
state_dicts convert directly (checkpoint/torch_convert.convert_densenet).

Each dense layer is BN→ReLU→1x1 conv (4·growth bottleneck)→BN→ReLU→3x3
conv (growth), its output CONCATENATED onto the running feature map;
transitions halve channels (1x1 conv) and pool 2x2. TPU notes: the
concat-growth pattern is HBM-bandwidth-hungry by construction (every layer
re-reads the whole accumulated map) — XLA fuses the BN+ReLU prologues into
the convs, and NHWC keeps the growing channel axis innermost so concats
are contiguous writes. bf16 compute with fp32 params/statistics.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_CONFIGS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}
_GROWTH = 32


class DenseLayer(nn.Module):
    growth: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        y = nn.relu(norm("norm1")(x))
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = nn.relu(norm("norm2")(y))
        y = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth: int = _GROWTH
    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(2 * self.growth, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(norm("norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, layers in enumerate(self.block_config):
            for j in range(layers):
                x = DenseLayer(self.growth, dtype=self.dtype,
                               name=f"block{i}_layer{j}")(x, train=train)
            if i != len(self.block_config) - 1:
                x = nn.relu(norm(f"transition{i}_norm")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"transition{i}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(norm("norm5")(x))
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def _make(name):
    cfg = _CONFIGS[name]

    def ctor(num_classes=1000, dtype=jnp.float32, **kw):
        return DenseNet(cfg, num_classes=num_classes, dtype=dtype)

    ctor.__name__ = name
    return ctor


densenet121 = _make("densenet121")
densenet169 = _make("densenet169")
densenet201 = _make("densenet201")
