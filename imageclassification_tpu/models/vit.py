"""Vision Transformer (NHWC patches, flax.linen).

Classic ViT (timm `vit_*_patch*_224` equivalents, reached through the
reference's `timm.create_model`, train.py:194): conv patch embed, learned
cls token + position embedding, pre-LN transformer encoder, stochastic depth.

TPU notes: attention and MLP matmuls dominate — they run in bf16 on the MXU with
fp32 accumulation (flax attention uses preferred_element_type under the hood via
dtype promotion); sequence length 197 pads to MXU tiles, which XLA handles.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, Mlp, drop_path_rates, truncated_normal_init

Dtype = Any


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            kernel_init=truncated_normal_init(),
            deterministic=not train,
            dropout_rate=self.drop_rate,
        )(y, y)
        x = x + DropPath(self.drop_path)(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), drop_rate=self.drop_rate,
                dtype=self.dtype)(y, deterministic=not train)
        x = x + DropPath(self.drop_path)(y, deterministic=not train)
        return x


class ViT(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = x.astype(self.dtype)
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), (p, p), padding="VALID", dtype=self.dtype,
                    kernel_init=truncated_normal_init(), name="patch_embed")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embed", truncated_normal_init(),
                         (1, x.shape[1], self.dim))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        rates = drop_path_rates(self.drop_path_rate, [self.depth])[0]
        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.num_heads, self.mlp_ratio,
                             drop_rate=self.drop_rate, drop_path=rates[i],
                             dtype=self.dtype, name=f"block{i}")(x, train=train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x[:, 0]
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def _make(patch, dim, depth, heads):
    def ctor(num_classes=1000, drop_path_rate=0.0, drop_rate=0.0,
             dtype=jnp.float32, **kw):
        return ViT(patch_size=patch, dim=dim, depth=depth, num_heads=heads,
                   num_classes=num_classes, drop_path_rate=drop_path_rate,
                   drop_rate=drop_rate, dtype=dtype)
    return ctor


vit_tiny_patch16 = _make(16, 192, 12, 3)
vit_small_patch16 = _make(16, 384, 12, 6)
vit_small_patch32 = _make(32, 384, 12, 6)
vit_base_patch16 = _make(16, 768, 12, 12)
vit_base_patch32 = _make(32, 768, 12, 12)
vit_large_patch16 = _make(16, 1024, 24, 16)
