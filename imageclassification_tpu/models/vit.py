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

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, Mlp, drop_path_rates, truncated_normal_init

Dtype = Any


def flash_attention_fn(query, key, value, bias=None, mask=None, **kwargs):
    """flax `attention_fn` backed by the Pallas TPU flash-attention kernel.

    Parameter-tree neutral: plugs into MultiHeadDotProductAttention, so
    checkpoints/converters are unaffected. [B, N, H, D] in/out; the token
    axis pads to a 128 multiple with the padded KEYS masked via segment ids
    (queries keep one segment — padded query rows attend real keys, avoiding
    fully-masked softmax rows, and are sliced away). Never materializes the
    [B, H, N, N] attention matrix.

    Measured (benchmarks/attention_bench_n*.json): at 197 tokens (224²) the
    XLA einsum path wins 2x; at 577 (384²) flash wins the isolated op but
    loses ~15% in the full step (pad/transpose + fusion-barrier overhead);
    at 4097 tokens (1024²) flash wins 2-3x and the einsum path's ~3 GB of
    materialized attention matrices become the binding constraint. Hence
    opt-in via --flash_attn for high-resolution fine-tuning."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    assert bias is None and mask is None, "flash path takes no bias/mask"
    B, N, H, D = query.shape
    npad = max(128, -(-N // 128) * 128)
    pad = npad - N

    def prep(x):
        return jnp.moveaxis(
            jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2
        )

    q_seg = jnp.ones((B, npad), jnp.int32)
    kv_seg = jnp.concatenate(
        [jnp.ones((B, N), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=1
    )
    # block size must DIVIDE the padded sequence AND be a multiple of 128;
    # a single whole-sequence block fits VMEM comfortably up to 1024 tokens
    if npad <= 1024:
        blk = npad
    else:
        blk = next(d for d in (512, 384, 256, 128) if npad % d == 0)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        prep(query), prep(key), prep(value),
        segment_ids=SegmentIds(q_seg, kv_seg),
        sm_scale=D ** -0.5, block_sizes=bs,
    )
    return jnp.moveaxis(out, 2, 1)[:, :N]


class _HeadProj(nn.Module):
    """q/k/v projection emitting [B, H, N, head_dim] directly. Param tree
    (kernel [D,H,hd], bias [H,hd]) matches flax DenseGeneral, so checkpoints
    and the torch converter are unaffected."""

    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kern = self.param("kernel", truncated_normal_init(),
                          (x.shape[-1], self.heads, self.head_dim))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads, self.head_dim))
        y = jnp.einsum("bnd,dhk->bhnk", x.astype(self.dtype),
                       kern.astype(self.dtype))
        return y + bias.astype(self.dtype)[None, :, None, :]


class _OutProj(nn.Module):
    """[B, H, N, head_dim] -> [B, N, D]; params match flax MHA 'out'."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        kern = self.param("kernel", truncated_normal_init(),
                          (y.shape[1], y.shape[3], self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        out = jnp.einsum("bhnk,hkd->bnd", y, kern.astype(self.dtype))
        return out + bias.astype(self.dtype)


class HeadMajorAttention(nn.Module):
    """Multi-head self-attention computed entirely in [B, H, N, head_dim].

    Hypothesis tested: flax's MultiHeadDotProductAttention keeps activations
    logically [B, N, H, D]; its attention einsums take (b, h) as batch dims,
    so XLA's layout assignment inserts physical transposes around every dot
    (HLO census: ~155 copies of the 38.7 MB head-split tensors per vit_base
    train step ~ 6 GB/step, the 12% 'copy' band in
    trace_ops_vit_base_patch16.json). Projecting q/k/v straight into
    head-major order hands every dot canonical batched-matmul operands.

    MEASURED VERDICT (benchmarks/attn_layout_bench.json): dead even —
    202.44 ms/step (flax) vs 202.45 ms/step (this), bit-identical outputs.
    The bhnd HLO still carries 298 copies, merely moved to other shapes
    ([128,12,197,64] and its transpose): the projection dots want
    token-major operands and the attention dots want head-major, so a
    transpose divide exists in EITHER logical order and XLA already
    schedules it at its optimum. Kept as the measured receipt (sixth
    XLA-rewrite matchup, sixth draw-or-loss); the flax path stays the
    default."""

    num_heads: int
    dropout_rate: float = 0.0
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        hd = D // self.num_heads
        q = _HeadProj(self.num_heads, hd, self.dtype, name="query")(x)
        k = _HeadProj(self.num_heads, hd, self.dtype, name="key")(x)
        v = _HeadProj(self.num_heads, hd, self.dtype, name="value")(x)
        w = jnp.einsum("bhnk,bhmk->bhnm", q * (hd ** -0.5), k)
        w = jax.nn.softmax(w, axis=-1)
        if self.dropout_rate > 0.0:
            # flax MHA defaults to broadcast_dropout=True: one [N, N] mask
            # shared across batch AND heads — match that regularization
            # semantics (the RNG stream still differs, so train-mode runs
            # are seed-equivalent in distribution, not bit-identical)
            w = nn.Dropout(self.dropout_rate, broadcast_dims=(0, 1))(
                w, deterministic=self.deterministic
            )
        y = jnp.einsum("bhnm,bhmk->bhnk", w, v)
        return _OutProj(D, self.dtype, name="out")(y)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path: float = 0.0
    flash_attn: bool = False
    attn_impl: str = "flax"   # "flax" (MHA) | "bhnd" (head-major, measured
    # equal — see HeadMajorAttention docstring)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # flash kernel has no attention-dropout path — fall back to the
        # einsum attention when attention dropout is active (ViT.__call__
        # warns once per model about the conflict)
        use_flash = self.flash_attn and (self.drop_rate == 0.0 or not train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        if self.attn_impl == "bhnd" and not use_flash:
            y = HeadMajorAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                deterministic=not train,
                dropout_rate=self.drop_rate,
                name="MultiHeadDotProductAttention_0",  # checkpoint-stable
            )(y)
        else:
            attn_kwargs = {}
            if use_flash:
                attn_kwargs["attention_fn"] = flash_attention_fn
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                kernel_init=truncated_normal_init(),
                deterministic=not train,
                dropout_rate=0.0 if use_flash else self.drop_rate,
                **attn_kwargs,
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
    flash_attn: bool = False
    attn_impl: str = "flax"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.flash_attn and self.drop_rate > 0.0 and train:
            # trace-time (once per compile of the model), not per step
            print(
                "WARNING: --flash_attn requested but attention dropout "
                f"(drop_rate={self.drop_rate}) forces the einsum attention "
                "path for training steps"
            )
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
                             flash_attn=self.flash_attn,
                             attn_impl=self.attn_impl,
                             dtype=self.dtype, name=f"block{i}")(x, train=train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x[:, 0]
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="head")(x)
        return x


def _make(patch, dim, depth, heads):
    def ctor(num_classes=1000, drop_path_rate=0.0, drop_rate=0.0,
             dtype=jnp.float32, flash_attn=False, attn_impl=None, **kw):
        import os
        if attn_impl is None:
            attn_impl = os.environ.get("VIT_ATTN_IMPL", "flax")
        return ViT(patch_size=patch, dim=dim, depth=depth, num_heads=heads,
                   num_classes=num_classes, drop_path_rate=drop_path_rate,
                   drop_rate=drop_rate, flash_attn=flash_attn,
                   attn_impl=attn_impl, dtype=dtype)
    return ctor


vit_tiny_patch16 = _make(16, 192, 12, 3)
vit_small_patch16 = _make(16, 384, 12, 6)
vit_small_patch32 = _make(32, 384, 12, 6)
vit_base_patch16 = _make(16, 768, 12, 12)
vit_base_patch32 = _make(32, 768, 12, 12)
vit_large_patch16 = _make(16, 1024, 24, 16)
