"""Pallas TPU kernel: 7×7 depthwise convolution (ConvNeXt's spatial mixer,
reference block math convnext.py:30-54).

Why a kernel: XLA lowers depthwise convolutions as grouped convs with
feature_group_count == channels, which cannot use the MXU (each "matmul" is
1×1) and often materializes poor layouts. In NHWC the natural TPU execution is
pure VPU work — channels on the 128-lane axis, 49 shifted multiply-adds per
output tile — which is exactly what this kernel does: the whole (padded) image
block lives in VMEM and the accumulation runs in fp32 registers.

Forward + custom VJP:
  * dx  = depthwise correlation of the padded output-grad with the spatially
          flipped kernel — the same Pallas kernel, reused;
  * dw  = 49-term shifted reduction, left to XLA (a cheap fused reduce).

Scope: stride 1, SAME padding (pad 3), kernel 7×7 — the only configuration
ConvNeXt uses. Falls back to lax.conv for other configs or when the padded
image block would not fit comfortably in VMEM (large detection inputs).

VERDICT (round 2, real v5e, benchmarks/dwconv_bench.json): XLA's grouped-conv
lowering beats this kernel 4-5× at every ConvNeXt stage shape — its sliding
window reuses rows in registers where this kernel re-reads VMEM 49×. The
model path therefore uses XLA; this kernel is kept as the measured baseline
for a future register-blocked attempt.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
PAD = 3
# Keep the padded input block + accumulator well under the ~16MB VMEM budget.
_VMEM_LIMIT_BYTES = 6 * 1024 * 1024


def _kernel(x_ref, w_ref, o_ref):
    """x_ref: [1, H+6, W+6, C] (padded); w_ref: [7, 7, C]; o_ref: [1, H, W, C]."""
    H = o_ref.shape[1]
    W = o_ref.shape[2]
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tile = x_ref[0, dy : dy + H, dx : dx + W, :].astype(jnp.float32)
            acc = acc + tile * w_ref[dy, dx, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _dwconv_pallas(x_padded, w, out_dtype, H, W):
    B = x_padded.shape[0]
    C = x_padded.shape[-1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), out_dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 2 * PAD, W + 2 * PAD, C),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((K, K, C), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * K * K,
            bytes_accessed=(x_padded.size + B * H * W * C) * x_padded.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_padded, w)


def fits_vmem(H, W, C, itemsize=4) -> bool:
    padded = (H + 2 * PAD) * (W + 2 * PAD) * C * itemsize
    out = H * W * C * 4  # fp32 accumulator
    return padded + out < _VMEM_LIMIT_BYTES


@partial(jax.custom_vjp, nondiff_argnums=())
def depthwise_conv7x7(x, w):
    """x: [B, H, W, C]; w: [7, 7, C]; stride 1, SAME. Returns [B, H, W, C]."""
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return _dwconv_pallas(xp, w, x.dtype, H, W)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    B, H, W, C = x.shape
    # dx: correlate padded g with the flipped kernel (same Pallas kernel)
    gp = jnp.pad(g, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    w_flip = w[::-1, ::-1, :]
    dx = _dwconv_pallas(gp, w_flip, x.dtype, H, W)
    # dw: 49 shifted elementwise reductions (XLA fuses this into one pass)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0))).astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    rows = []
    for dy in range(K):
        cols = []
        for dx_ in range(K):
            tile = xp[:, dy : dy + H, dx_ : dx_ + W, :]
            cols.append(jnp.sum(tile * g32, axis=(0, 1, 2)))
        rows.append(jnp.stack(cols))
    dw = jnp.stack(rows).astype(w.dtype)
    return dx, dw


depthwise_conv7x7.defvjp(_fwd, _bwd)


def dwconv7x7_reference(x, w):
    """lax.conv reference (the XLA path this kernel replaces)."""
    return jax.lax.conv_general_dilated(
        x,
        w[:, :, None, :],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
