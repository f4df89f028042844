"""Pallas TPU kernel: 1x1-conv-as-matmul with a fused BatchNorm-statistics
epilogue (round-3 attack on the BN/HBM bandwidth wall, VERDICT item 1).

Why
---
Training ResNet-50 on v5e is bound by the BatchNorm machinery, not the conv
FLOPs: the per-op trace (benchmarks/trace_ops_resnet50.json) shows a 23.8
ms/step `convert_reduce_fusion` band — XLA materializes each conv output to
HBM, then RE-READS it in a separate fusion to reduce the batch statistics
(sum / sum-of-squares per channel). For a 1x1 convolution — a plain matmul
over (B*H*W, Cin) x (Cin, Cout) — the statistics can instead be accumulated
in the matmul's epilogue while the output tile is still in VMEM, deleting
the stat read pass entirely.

Kernel design
-------------
Grid over M-tiles (rows = B*H*W pixels); the full (K, N) weight block stays
resident in VMEM. Each grid step:
  1. (optional prologue) normalize+scale+shift+ReLU the INPUT tile with the
     previous layer's BN parameters — fusing the preceding BN-apply into
     this kernel's HBM read, so the normalized activation tensor is never
     materialized;
  2. matmul the tile on the MXU (bf16 in, fp32 accumulate);
  3. epilogue: accumulate column sums and sums-of-squares of the fp32
     output tile into a (2, N) stats output that lives across grid steps
     (TPU grids execute sequentially, so revisiting the same output block
     accumulates race-free).
Outputs: y (M, N) bf16 and stats (2, N) fp32 — exactly what train-mode BN
needs (mean = s0/M, var = s1/M - mean^2).

Measured verdict (round 3, real v5e chip): **XLA wins — kernel kept as the
measured baseline, model path unchanged.** Receipts in
benchmarks/conv1x1_bn_bench.json (bench: benchmarks/bench_conv1x1_bn.py):

* On the full chain conv->stats->normalize+ReLU->conv (the pattern a ResNet
  bottleneck executes), XLA's measured time is AT OR BELOW the minimum-
  traffic bound of the *ideal fused kernel* at 3 of 4 shapes (e.g.
  0.285 ms vs 0.314 ms ideal at 100352x512x128) — XLA already hides the
  stat-read pass behind the matmul/conv pipeline, so there is no separate
  reduce pass left to delete in the forward.
* The conv-op formulation beats the dot formulation of the same chain 2.3x
  (0.255 vs 0.591 ms at stage-2 shape): XLA's TPU convolution emitter +
  fusion is STRONGER than its dot path here — rewriting 1x1 convs as
  reshaped matmuls (this kernel's premise) starts from a handicap.
* fwd+bwd of the chain measures 0.70 ms vs an idealized perfect-fusion
  bound of 0.44 ms (~62% of ideal); this Pallas matmul reaches only
  30-50% of the bound in isolation, so even a full custom backward could
  not close the gap.
Same conclusion as the dwconv/LayerNorm/flash-attention matchups: on v5e,
XLA's memory-bound codegen is the bar, and it is high.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accumulate_stats(i, n_tiles, acc, stats_ref, scratch):
    """Accumulate (colsum, colsumsq) of the fp32 tile in a VMEM scratch;
    write the (2, N) output once, on the last grid step (TPU grids run
    sequentially, so the scratch persists across steps)."""
    s0 = jnp.sum(acc, axis=0, keepdims=True)           # (1, N)
    s1 = jnp.sum(acc * acc, axis=0, keepdims=True)     # (1, N)
    tile_stats = jnp.concatenate([s0, s1], axis=0)      # (2, N)

    @pl.when(i == 0)
    def _():
        scratch[:] = tile_stats

    @pl.when(i > 0)
    def _():
        scratch[:] = scratch[:] + tile_stats

    @pl.when(i == n_tiles - 1)
    def _():
        stats_ref[:] = scratch[:]


def _kernel(x_ref, w_ref, y_ref, stats_ref, scratch, *, n_tiles: int):
    """One M-tile: matmul + stat epilogue."""
    i = pl.program_id(0)
    acc = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )
    y_ref[:] = acc.astype(y_ref.dtype)
    _accumulate_stats(i, n_tiles, acc, stats_ref, scratch)


def _kernel_bn_in(x_ref, scale_ref, shift_ref, w_ref, y_ref, stats_ref,
                  scratch, *, n_tiles: int, relu_in: bool):
    """Variant with the previous layer's BN-apply (+ReLU) fused into the
    input read: x_norm = relu(x * scale + shift), where scale/shift fold the
    previous BN's (gamma, beta, mean, var)."""
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32) * scale_ref[:] + shift_ref[:]
    if relu_in:
        x = jnp.maximum(x, 0.0)
    acc = jnp.dot(
        x.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    )
    y_ref[:] = acc.astype(y_ref.dtype)
    _accumulate_stats(i, n_tiles, acc, stats_ref, scratch)


def _pick_tile_m(m: int, k: int, n: int, dtype_bytes: int = 2,
                 vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest power-of-two M tile (>=256) whose x/y blocks + weights fit the
    VMEM budget with double buffering."""
    for tile in (2048, 1024, 512, 256, 128):
        need = 2 * (tile * k * dtype_bytes          # x block (double-buffered)
                    + tile * n * dtype_bytes)       # y block
        need += k * n * dtype_bytes + 2 * n * 4 * 2
        if need <= vmem_budget and m % tile == 0:
            return tile
    if m % 128 != 0:
        raise ValueError(
            f"M={m} must be a multiple of 128 (batch*H*W of a standard input)"
        )
    raise ValueError(
        f"weight block ({k}x{n}) too large for the {vmem_budget >> 20} MiB "
        "VMEM budget at any M tile size"
    )


@functools.partial(jax.jit, static_argnames=("relu_in", "interpret"))
def conv1x1_bn_stats(
    x,
    w,
    prev_scale: Optional[jax.Array] = None,
    prev_shift: Optional[jax.Array] = None,
    relu_in: bool = True,
    interpret: bool = False,
):
    """y = maybe_relu(maybe_bn(x)) @ w, plus per-column (sum, sumsq) of y.

    x: (M, K) — a flattened NHWC activation (M = B*H*W); w: (K, N).
    prev_scale/prev_shift: optional (K,) fp32 folded BN-apply of the
    PRODUCING layer (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps));
    when given, the normalize (+ReLU if relu_in) happens in the kernel's
    input read instead of a separate XLA fusion pass.

    Returns (y (M, N) in x.dtype, stats (2, N) fp32)."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    tile_m = _pick_tile_m(m, k, n)
    grid = (pl.cdiv(m, tile_m),)

    out_shape = (
        jax.ShapeDtypeStruct((m, n), x.dtype),
        jax.ShapeDtypeStruct((2, n), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        # stats block revisited by every grid step -> sequential accumulation
        pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    cost = pl.CostEstimate(
        flops=2 * m * k * n + 3 * m * n,
        bytes_accessed=m * k * x.dtype.itemsize + k * n * w.dtype.itemsize
        + m * n * x.dtype.itemsize + 2 * n * 4,
        transcendentals=0,
    )

    scratch_shapes = [pltpu.VMEM((2, n), jnp.float32)]

    if prev_scale is None:
        return pl.pallas_call(
            functools.partial(_kernel, n_tiles=grid[0]),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            cost_estimate=cost,
            interpret=interpret,
        )(x, w)

    scale = prev_scale.reshape(1, k).astype(jnp.float32)
    shift = prev_shift.reshape(1, k).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel_bn_in, n_tiles=grid[0], relu_in=relu_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(x, scale, shift, w)


def xla_reference(x, w, prev_scale=None, prev_shift=None, relu_in=True):
    """The XLA formulation this kernel competes with (matmul -> separate
    stat reduces), for golden tests and benchmarking."""
    xf = x
    if prev_scale is not None:
        xf = x.astype(jnp.float32) * prev_scale.reshape(1, -1) \
            + prev_shift.reshape(1, -1)
        if relu_in:
            xf = jnp.maximum(xf, 0.0)
        xf = xf.astype(x.dtype)
    y = jnp.dot(xf, w, preferred_element_type=jnp.float32)
    s0 = jnp.sum(y, axis=0)
    s1 = jnp.sum(y * y, axis=0)
    return y.astype(x.dtype), jnp.stack([s0, s1]).astype(jnp.float32)
