"""Shared model building blocks (flax.linen, NHWC).

TPU notes: all convs take NHWC inputs (XLA's native TPU layout — avoids the
transposes torch's NCHW would force), compute can run in bfloat16 with fp32
params (`dtype` vs `param_dtype`), and stochastic depth is implemented with a
per-sample keep mask broadcast over the feature dims (reference analogue:
timm DropPath used by ConvNeXt blocks, object_detection/mmdet/models/backbones/
convnext.py:30-54).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics: scale by 1/keep)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel dim of an NHWC feature map.

    The reference ConvNeXt ships a dual-format LayerNorm (channels_first /
    channels_last, convnext.py:156-180) because torch is NCHW; in NHWC the
    channels_last path is the only one needed and it is a plain LayerNorm over
    the trailing axis."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


def truncated_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round to the nearest multiple of `divisor`, never dropping more than
    10% (torchvision `_make_divisible` == timm `round_channels` — both
    MobileNetV3 and EfficientNet channel tables use this rule)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class Mlp(nn.Module):
    """Transformer MLP: Dense → act → Dense (+dropout)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    # exact (erf) GELU: torch nn.GELU default, so converted timm weights
    # reproduce reference logits bit-for-bit (flax's default is tanh-approx)
    act: Callable = staticmethod(lambda x: nn.gelu(x, approximate=False))
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=truncated_normal_init())(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype,
                     kernel_init=truncated_normal_init())(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


def drop_path_rates(drop_path_rate: float, depths: Sequence[int]):
    """Linearly increasing per-block stochastic-depth rates (ConvNeXt/ViT
    convention; reference convnext.py:95-97)."""
    total = sum(depths)
    rates = [float(drop_path_rate) * i / max(total - 1, 1) for i in range(total)]
    out, k = [], 0
    for d in depths:
        out.append(rates[k : k + d])
        k += d
    return out
