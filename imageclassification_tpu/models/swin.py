"""Swin Transformer (NHWC, flax.linen) — timm-layout parity.

The reference reaches this family through `timm.create_model`
(/root/reference/train.py:194); this is a from-scratch TPU-native
implementation of timm's `swin_{tiny,small,base}_patch4_window7_224`
(microsoft/Swin-Transformer semantics) so timm hub state_dicts convert
directly (checkpoint/torch_convert.convert_swin).

TPU notes: the round-5 chip trace showed window partition/reverse and the
qkv head-split transposes are NOT free — 31% of the legacy step was
copy/reshape layout movement, and the [.., 49, 49]/[.., 49, 32] window
tensors pad their lane dim to 128 (2.6-4x traffic). The default layout is
therefore `WindowAttention.merged`: qkv is projected in NHWC before
windowing (partition + head-split = ONE transpose each way) and 2
horizontally-adjacent windows share one attention matrix with -100
blocking across windows — measured 1.45-1.57x per block
(benchmarks/swin_layout_bench.json); the per-window timm dataflow is kept
behind `attn_layout="legacy"`. The shifted-window attention mask and the
relative-position index are STATIC for a given (H, W, window, shift) —
computed in numpy at trace time and entering the graph as constants (no
dynamic shapes, no recompiles between steps). Windows clamp to the feature-map size on small inputs (timm does
the same). Input-size constraint: every stage's feature map must divide
into whole windows (or fit inside one), and PatchMerging halves maps so
they must be even when merged — for window 7 that means inputs of
224·2^k (224, 448, 896, …); SwinTransformer validates this up front with
an exact error instead of crashing mid-stage.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import DropPath, Mlp, drop_path_rates, truncated_normal_init

Dtype = Any


@lru_cache(maxsize=None)
def _relative_position_index(w: int) -> np.ndarray:
    """[w², w²] index into the (2w-1)² relative-position bias table
    (Swin-Transformer models/swin_transformer.py semantics)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)                           # [2, w²]
    rel = flat[:, :, None] - flat[:, None, :]              # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)                 # shift to >= 0
    return (rel[:, :, 0] * (2 * w - 1) + rel[:, :, 1]).astype(np.int32)


@lru_cache(maxsize=None)
def _relative_position_onehot(w: int) -> np.ndarray:
    """[w⁴, (2w-1)²] one-hot of _relative_position_index: the bias lookup
    becomes `onehot @ table` (a [2401,169]×[169,h] matmul) instead of a
    gather. Identical values; the win is the BACKWARD — a gather's VJP is a
    scatter-add, which the TPU serializes row by row (the same pathology
    that motivated the one-hot per-class metric einsums, engine/step.py),
    while the matmul's VJP is `onehotᵀ @ grad`, one dense MXU op."""
    idx = _relative_position_index(w).reshape(-1)
    onehot = np.zeros((idx.size, (2 * w - 1) ** 2), np.float32)
    onehot[np.arange(idx.size), idx] = 1.0
    return onehot


@lru_cache(maxsize=None)
def _shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """[nW, w², w²] additive mask (-100 across region boundaries) for
    shifted-window attention. Static per feature-map geometry."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = (
        img.reshape(H // w, w, W // w, w)
        .transpose(0, 2, 1, 3)
        .reshape(-1, w * w)
    )                                                      # [nW, w²]
    diff = wins[:, None, :] != wins[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_partition(x, w):
    B, H, W, C = x.shape
    return (
        x.reshape(B, H // w, w, W // w, w, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, w * w, C)
    )


def _window_reverse(x, w, H, W):
    B = x.shape[0] // (H // w * W // w)
    return (
        x.reshape(B, H // w, W // w, w, w, -1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, -1)
    )


@lru_cache(maxsize=None)
def _merged_attn_mask(H: int, W: int, w: int, shift: int,
                      G: int) -> np.ndarray:
    """[nW/G, G·w², G·w²] additive float32 mask for G-window-merged
    attention: −100 across the G windows of a merged group and (for
    shifted blocks) across shift regions — exactly the values the
    per-window path adds, extended with the cross-window blocking the
    merge introduces. Groups are G horizontally-adjacent windows in
    raster order (requires (W//w) % G == 0 so groups never span rows)."""
    n = w * w
    nW = (H // w) * (W // w)
    win = np.repeat(np.arange(G), n)                       # [G·n]
    blocked = win[:, None] != win[None, :]
    blocked = np.broadcast_to(blocked, (nW // G, G * n, G * n)).copy()
    if shift:
        img = np.zeros((H, W), np.int32)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                img[hs, ws] = cnt
                cnt += 1
        reg = (img.reshape(H // w, w, W // w, w)
               .transpose(0, 2, 1, 3).reshape(nW // G, G * n))
        blocked |= reg[:, :, None] != reg[:, None, :]
    return np.where(blocked, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias; params mirror timm
    (qkv: one Dense 3C w/ bias; proj: Dense C; bias table [(2w-1)², heads]).

    Two layouts over the SAME parameters (outputs bit-equal, locked by
    tests/test_models.py::test_swin_merged_layout_equals_legacy):

    - ``__call__`` — the per-window path: callers partition to
      [B·nW, w², C] first (timm's dataflow).
    - ``merged`` — the TPU layout (default via SwinBlock): qkv is
      projected in NHWC *before* windowing so partition + head-split is
      ONE transpose each way, and G horizontally-adjacent windows share
      one attention matrix with −100 blocking across windows. Receipts
      (benchmarks/swin_layout_bench.json, chip, B=128): 1.45–1.57×
      per-block over the per-window path — the win is layout traffic
      (trace: 31% of the legacy step was copy/reshape movement), not
      FLOPs, which the merge *increases* while the MXU sits at 1–7%.
    """

    dim: int
    num_heads: int
    window: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                            kernel_init=truncated_normal_init())
        self.proj = nn.Dense(self.dim, dtype=self.dtype,
                             kernel_init=truncated_normal_init())
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            truncated_normal_init(),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )

    def _bias_hnm(self, dtype):
        """[h, w², w²] bias via one-hot matmul instead of table[idx]
        gather: same values, dense matmul backward instead of a
        serialized scatter-add (see _relative_position_onehot)."""
        n = self.window ** 2
        onehot = jnp.asarray(_relative_position_onehot(self.window), dtype)
        bias = onehot @ self.relative_position_bias_table.astype(dtype)
        return bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)

    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        qkv = self.qkv(x)
        qkv = qkv.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                   # [B_, h, N, hd]
        attn = jnp.einsum("bhnk,bhmk->bhnm", q * (hd ** -0.5), k)
        bias = self._bias_hnm(attn.dtype)                  # [h, N, N] (tiny)

        if mask is not None:                               # [nW, N, N] static
            # fold bias and mask into ONE broadcast add over the big attn
            # tensor (two separate adds each re-stream B_·h·N² elements)
            nW = mask.shape[0]
            combined = bias[None] + jnp.asarray(mask, attn.dtype)[:, None]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + combined[None]
            attn = attn.reshape(B_, h, N, N)
        else:
            attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bhmk->bhnk", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return self.proj(y)

    def merged(self, y, shift: int, G: int):
        """[B,H,W,C] → [B,H,W,C]: windowing folded into the qkv/out
        transposes, G windows per attention group (see class doc)."""
        B, H, W, C = y.shape
        w = self.window
        h, hd = self.num_heads, self.dim // self.num_heads
        n = w * w
        Hr, Wc = H // w, W // w
        qkv = self.qkv(y)                                  # [B,H,W,3C]
        # ONE copy: [B,H,W,3C] → [3, B, nW/G, h, G·n, hd]
        qkv = qkv.reshape(B, Hr, w, Wc // G, G, w, 3, h, hd)
        qkv = qkv.transpose(6, 0, 1, 3, 7, 4, 2, 5, 8).reshape(
            3, B, Hr * Wc // G, h, G * n, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bghnk,bghmk->bghnm", q * (hd ** -0.5), k)
        bias = self._bias_hnm(attn.dtype)                  # [h, n, n]
        if G > 1 or shift:
            static = _merged_attn_mask(H, W, w, shift, G)  # [nW/G, Gn, Gn]
            combined = (jnp.tile(bias, (1, G, G))[None]
                        + jnp.asarray(static, attn.dtype)[:, None])
            attn = attn + combined[None]                   # [B,nW/G,h,Gn,Gn]
        else:
            attn = attn + bias[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bghnm,bghmk->bghnk", attn, v)
        # ONE copy back: [B, nW/G, h, G·n, hd] → [B,H,W,C]
        o = o.reshape(B, Hr, Wc // G, h, G, w, w, hd)
        o = o.transpose(0, 1, 5, 2, 4, 6, 3, 7).reshape(B, H, W, C)
        return self.proj(o)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path: float = 0.0
    # "merged" (default): the TPU window-attention layout — one fused
    # partition+head-split transpose each way, 2 windows per attention
    # group (benchmarks/swin_layout_bench.json: 1.45-1.57x per block).
    # "legacy": the per-window timm dataflow (partition → attention →
    # reverse). Outputs are equal; params identical.
    attn_layout: str = "merged"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        if H <= self.window and W <= self.window:
            # one window covers the map: clamp and drop the shift (timm
            # SwinTransformerBlock does the same for small feature maps)
            w, shift = min(H, W), 0
        else:
            w, shift = self.window, self.shift
            # unreachable through SwinTransformer (validated up front by
            # check_input_size); kept for direct SwinBlock users
            assert H % w == 0 and W % w == 0, (
                f"feature map {H}x{W} not divisible by window {w}"
            )

        attn = WindowAttention(self.dim, self.num_heads, w,
                               dtype=self.dtype, name="attn")
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        if self.attn_layout == "merged" and (H > w or W > w):
            # merge 2 horizontally-adjacent windows per attention group
            # when the window grid allows it (it always does for the
            # check_input_size-validated classification sizes)
            G = 2 if (W // w) % 2 == 0 else 1
            y = attn.merged(y, shift, G)
        else:
            y = _window_partition(y, w)
            mask = _shift_attn_mask(H, W, w, shift) if shift else None
            y = attn(y, mask)
            y = _window_reverse(y, w, H, W)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + DropPath(self.drop_path)(y, deterministic=not train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), drop_rate=self.drop_rate,
                dtype=self.dtype, name="mlp")(y, deterministic=not train)
        return x + DropPath(self.drop_path)(y, deterministic=not train)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat (4C) -> LN -> Linear 4C->2C (timm order)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # timm concat order: (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)
        y = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2],
        ], axis=-1)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        kernel_init=truncated_normal_init(),
                        name="reduction")(y)


def check_input_size(size: int, window: int, n_stages: int = 4) -> None:
    """Raise ValueError unless `size` runs through every stage: each
    stage's feature map (size/4, halved by PatchMerging before stages
    1..n-1) must be divisible by `window` when larger than one window,
    and even whenever it is merged."""

    def ok(h: int) -> bool:
        if h % 4:
            return False
        m = h // 4
        for s in range(n_stages):
            if s > 0:
                if m % 2:
                    return False
                m //= 2
            if m > window and m % window:
                return False
        return True

    if not ok(size):
        valid = [s for s in range(window * 4, 8 * 224 + 1) if ok(s)]
        raise ValueError(
            f"input size {size} unsupported by Swin with window {window}: "
            f"every stage's feature map must divide into {window}-windows "
            f"(or fit in one) and be even when PatchMerging halves it. "
            f"Supported sizes ≤ {8 * 224}: {valid}"
        )


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    features_only: bool = False       # multi-scale NHWC maps, strides 4-32
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    attn_layout: str = "merged"       # see SwinBlock.attn_layout
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for size in (x.shape[1], x.shape[2]):
            check_input_size(size, self.window, len(self.depths))
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (4, 4), (4, 4), padding="VALID",
                    dtype=self.dtype, kernel_init=truncated_normal_init(),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_norm")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        rates = drop_path_rates(self.drop_path_rate, self.depths)
        features = []
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * 2 ** s
            if s > 0:
                x = PatchMerging(dtype=self.dtype,
                                 name=f"merge{s - 1}")(x)
            for b in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[s], self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    drop_rate=self.drop_rate, drop_path=rates[s][b],
                    attn_layout=self.attn_layout,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x, train=train)
            if self.features_only and s in self.out_indices:
                # per-stage out norms, the downstream-backbone convention
                # (mmseg/mmdet Swin registers norm{i} per out index — same
                # pattern as the ConvNeXt backbone's norm{i})
                features.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm{s}")(x))
        if self.features_only:
            return features
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def _make(dim, depths, heads):
    def ctor(num_classes=1000, dtype=jnp.float32, drop_path_rate=0.0,
             drop_rate=0.0, features_only=False, out_indices=(0, 1, 2, 3),
             attn_layout="merged", **kw):
        return SwinTransformer(
            embed_dim=dim, depths=depths, num_heads=heads,
            num_classes=num_classes, drop_rate=drop_rate,
            drop_path_rate=drop_path_rate, features_only=features_only,
            out_indices=tuple(out_indices), attn_layout=attn_layout,
            dtype=dtype,
        )
    return ctor


swin_tiny_patch4_window7_224 = _make(96, (2, 2, 6, 2), (3, 6, 12, 24))
swin_small_patch4_window7_224 = _make(96, (2, 2, 18, 2), (3, 6, 12, 24))
swin_base_patch4_window7_224 = _make(128, (2, 2, 18, 2), (4, 8, 16, 32))
