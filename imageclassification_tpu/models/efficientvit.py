"""EfficientViT (MSRA, CVPR'23 "Memory Efficient Vision Transformer with
Cascaded Group Attention") — the reference's default model family
(`efficientvit_m0`, train.py:41, created through timm at train.py:194 with
`drop_rate` routing at train.py:189-190).

From-scratch NHWC flax implementation:
  * Conv+BN everywhere (BN folds into conv at inference; stats are global-batch
    under the sharded jit step);
  * cascaded group attention: channels split across heads, head i's input is
    chunk_i + head_{i-1}'s output; per-head qkv 1×1 conv, depthwise conv on q,
    learned relative attention biases over window positions;
  * local window attention (window 7) when the feature map is larger than the
    window;
  * sandwich layout per block: DW conv → FFN → window attention → DW conv → FFN,
    all residual.

Variant table (embed dims / depths / heads) follows the MSRA m0-m5 configs;
key_dim is 16 everywhere and the per-head value dim is dim // num_heads (which
makes the cascade shapes line up).
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm — the Conv2d_BN unit used throughout."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    bn_weight_init: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=self.padding,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         scale_init=nn.initializers.constant(self.bn_weight_init))(x)
        return x


class ConvMlp(nn.Module):
    """FFN: 1×1 ConvBN → ReLU → 1×1 ConvBN (second BN gamma zero-init)."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.hidden, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = ConvBN(self.dim, bn_weight_init=0.0, dtype=self.dtype)(x, train)
        return x


class SqueezeExcite(nn.Module):
    rd_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = max(1, int(c * self.rd_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


def _attention_bias_index(resolution: int):
    """Unique |Δx|,|Δy| offset ids for an r×r window → idxs [N, N]."""
    points = list(itertools.product(range(resolution), range(resolution)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return len(offsets), np.asarray(idxs, dtype=np.int32).reshape(n, n)


class CascadedGroupAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        d = self.dim // self.num_heads          # per-head value dim
        scale = self.key_dim ** -0.5
        n_off, idxs = _attention_bias_index(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off))
        bias_tbl = biases[:, idxs]              # [heads, N, N]

        chunk = C // self.num_heads
        feats_out = []
        feat = x[..., :chunk]
        for i in range(self.num_heads):
            if i > 0:
                feat = feat + x[..., i * chunk : (i + 1) * chunk]
            qkv = ConvBN(2 * self.key_dim + d, dtype=self.dtype,
                         name=f"qkv{i}")(feat, train)
            q = qkv[..., : self.key_dim]
            k = qkv[..., self.key_dim : 2 * self.key_dim]
            v = qkv[..., 2 * self.key_dim :]
            kk = self.kernels[i] if i < len(self.kernels) else self.kernels[-1]
            q = ConvBN(self.key_dim, kernel=kk, padding=kk // 2,
                       groups=self.key_dim, dtype=self.dtype,
                       name=f"dw_q{i}")(q, train)
            # flatten spatial → tokens
            qf = q.reshape(B, H * W, self.key_dim)
            kf = k.reshape(B, H * W, self.key_dim)
            vf = v.reshape(B, H * W, d)
            attn = jnp.einsum("bnk,bmk->bnm", qf, kf,
                              preferred_element_type=jnp.float32) * scale
            attn = attn + bias_tbl[i].astype(attn.dtype)
            attn = nn.softmax(attn, axis=-1).astype(vf.dtype)
            out = jnp.einsum("bnm,bmd->bnd", attn, vf,
                             preferred_element_type=jnp.float32).astype(vf.dtype)
            feat = out.reshape(B, H, W, d)
            feats_out.append(feat)
        x = jnp.concatenate(feats_out, axis=-1)
        x = nn.relu(x)
        x = ConvBN(self.dim, bn_weight_init=0.0, dtype=self.dtype,
                   name="proj")(x, train)
        return x


class LocalWindowAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    resolution: int
    window_resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        wr = min(self.window_resolution, H, W)
        attn = CascadedGroupAttention(
            self.dim, self.key_dim, self.num_heads, resolution=wr,
            kernels=self.kernels, dtype=self.dtype, name="attn")
        if H <= wr and W <= wr:
            return attn(x, train)
        # pad to window multiples, partition, attend per window, un-partition
        pad_b = (wr - H % wr) % wr
        pad_r = (wr - W % wr) % wr
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nh, nw = Hp // wr, Wp // wr
        xw = xp.reshape(B, nh, wr, nw, wr, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nh * nw, wr, wr, C)
        xw = attn(xw, train)
        xw = xw.reshape(B, nh, nw, wr, wr, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xw.reshape(B, Hp, Wp, C)
        return xp[:, :H, :W, :]


class EfficientVitBlock(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    resolution: int
    window_resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + ConvBN(self.dim, kernel=3, padding=1, groups=self.dim,
                       bn_weight_init=0.0, dtype=self.dtype, name="dw0")(x, train)
        x = x + ConvMlp(self.dim, self.dim * 2, dtype=self.dtype,
                        name="ffn0")(x, train)
        x = x + LocalWindowAttention(
            self.dim, self.key_dim, self.num_heads, self.resolution,
            self.window_resolution, self.kernels, dtype=self.dtype,
            name="mixer")(x, train)
        x = x + ConvBN(self.dim, kernel=3, padding=1, groups=self.dim,
                       bn_weight_init=0.0, dtype=self.dtype, name="dw1")(x, train)
        x = x + ConvMlp(self.dim, self.dim * 2, dtype=self.dtype,
                        name="ffn1")(x, train)
        return x


class PatchMerging(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = x.shape[-1] * 4
        x = ConvBN(hid, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = ConvBN(hid, kernel=3, stride=2, padding=1, groups=hid,
                   dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = SqueezeExcite(dtype=self.dtype)(x)
        x = ConvBN(self.out_dim, dtype=self.dtype)(x, train)
        return x


class EfficientViT(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 192)
    depths: Sequence[int] = (1, 2, 3)
    num_heads: Sequence[int] = (4, 4, 4)
    window_sizes: Sequence[int] = (7, 7, 7)
    key_dim: int = 16
    kernels: Sequence[int] = (5, 5, 5, 5)
    num_classes: int = 1000
    drop_rate: float = 0.0
    img_size: int = 224
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        d0 = self.embed_dims[0]
        # overlapping patch embed: 4× (conv3x3 s2 + BN) with ReLU between → /16
        for i, f in enumerate((d0 // 8, d0 // 4, d0 // 2, d0)):
            x = ConvBN(f, kernel=3, stride=2, padding=1, dtype=self.dtype,
                       name=f"patch_embed{i}")(x, train)
            if i < 3:
                x = nn.relu(x)

        res = self.img_size // 16
        for s, (dim, depth, heads, win) in enumerate(
            zip(self.embed_dims, self.depths, self.num_heads, self.window_sizes)
        ):
            if s > 0:
                prev = self.embed_dims[s - 1]
                # subsample sandwich: DW+FFN → PatchMerging → DW+FFN
                x = x + ConvBN(prev, kernel=3, padding=1, groups=prev,
                               dtype=self.dtype, name=f"sub{s}_dw0")(x, train)
                x = x + ConvMlp(prev, prev * 2, dtype=self.dtype,
                                name=f"sub{s}_ffn0")(x, train)
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"sub{s}_merge")(x, train)
                res = (res - 1) // 2 + 1
                x = x + ConvBN(dim, kernel=3, padding=1, groups=dim,
                               dtype=self.dtype, name=f"sub{s}_dw1")(x, train)
                x = x + ConvMlp(dim, dim * 2, dtype=self.dtype,
                                name=f"sub{s}_ffn1")(x, train)
            for b in range(depth):
                x = EfficientVitBlock(dim, self.key_dim, heads, res, win,
                                      self.kernels, dtype=self.dtype,
                                      name=f"stage{s}_block{b}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        # BN + Linear head (MSRA BN_Linear), with classifier dropout (the
        # reference routes --drop_path into drop_rate for this family)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="head_bn")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


_VARIANTS = {
    "m0": dict(embed_dims=(64, 128, 192), depths=(1, 2, 3), num_heads=(4, 4, 4)),
    "m1": dict(embed_dims=(128, 144, 192), depths=(1, 2, 3), num_heads=(2, 3, 3)),
    "m2": dict(embed_dims=(128, 192, 224), depths=(1, 2, 3), num_heads=(4, 3, 2)),
    "m3": dict(embed_dims=(128, 240, 320), depths=(1, 2, 3), num_heads=(4, 3, 4)),
    "m4": dict(embed_dims=(128, 256, 384), depths=(1, 2, 3), num_heads=(4, 4, 4)),
    "m5": dict(embed_dims=(192, 288, 384), depths=(1, 3, 4), num_heads=(3, 3, 4)),
}


def _make(variant):
    cfgv = _VARIANTS[variant]

    def ctor(num_classes=1000, drop_rate=0.0, dtype=jnp.float32, img_size=224, **kw):
        return EfficientViT(num_classes=num_classes, drop_rate=drop_rate,
                            dtype=dtype, img_size=img_size, **cfgv)

    return ctor


efficientvit_m0 = _make("m0")
efficientvit_m1 = _make("m1")
efficientvit_m2 = _make("m2")
efficientvit_m3 = _make("m3")
efficientvit_m4 = _make("m4")
efficientvit_m5 = _make("m5")
