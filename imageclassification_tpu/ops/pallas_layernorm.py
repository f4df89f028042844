"""Pallas TPU kernel: fused LayerNorm over the trailing (channel) axis.

Why: the device trace of the ConvNeXt train step (benchmarks/
trace_ops_convnext_tiny.json) shows LayerNorm machinery — fp32-promoted
statistics reductions plus backward select/convert passes — costing ~46% of
the step while the convolutions cost 3%. XLA executes LN as several separate
HBM passes; on TPU the natural execution is ONE pass per direction: rows on
sublanes, channels on lanes, per-row mean/var as lane reductions in fp32
registers.

forward:  y = (x - mean) * rstd * gamma + beta          (one read, one write)
backward: recomputes mean/rstd from x in-kernel (no stat residuals, no extra
          HBM traffic) and emits dx plus per-block partial dgamma/dbeta that
          XLA sums afterwards (a [grid, C] reduction — tiny).

    g' = dy * gamma
    dx = rstd * (g' - mean_c(g') - xhat * mean_c(g' * xhat))
    dgamma = sum_rows(dy * xhat),  dbeta = sum_rows(dy)

NOT on the model path: measured against XLA's LayerNorm at every ConvNeXt
stage shape on the real chip (benchmarks/layernorm_bench.json), XLA wins
2-5× — its fused elementwise/reduce codegen already runs at bandwidth
speed-of-light. The kernel is kept as a golden-tested, benchmarked baseline
(see BREAKDOWN.md); models use nn.LayerNorm. Falls back to the pure-jnp
reference off-TPU or for shapes the kernel does not cover.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows-per-block chosen so the fp32 working set stays well inside VMEM
_VMEM_BUDGET = 4 * 1024 * 1024
_MAX_C = 4096


def _pick_rows(n_rows: int, c: int) -> int:
    budget_rows = max(8, _VMEM_BUDGET // (c * 4 * 3))
    r = 1024
    while r > budget_rows or n_rows % r:
        r //= 2
        if r < 8:
            # Mosaic requires (8, 128)-divisible (or full-dim) blocks; a
            # row block under 8 (n_rows with a small 2-adic part, e.g.
            # 788 = 4·197) would fail to compile — use the jnp fallback
            return 0
    return r


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)            # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    gp = dy * gamma
    m1 = jnp.mean(gp, axis=-1, keepdims=True)
    m2 = jnp.mean(gp * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (gp - m1 - xhat * m2)).astype(dx_ref.dtype)
    dg_ref[0, 0, :] = jnp.sum(dy * xhat, axis=0)  # per-block partials
    db_ref[0, 0, :] = jnp.sum(dy, axis=0)


def _run_fwd(x2, gamma, beta, eps, rows):
    n, c = x2.shape
    grid = n // rows
    return pl.pallas_call(
        partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * c,
            bytes_accessed=2 * n * c * x2.dtype.itemsize,
            transcendentals=n,
        ),
    )(x2, gamma, beta)


def _run_bwd(x2, gamma, dy2, eps, rows):
    n, c = x2.shape
    grid = n // rows
    dx, dg_part, db_part = pl.pallas_call(
        partial(_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), dy2.dtype),
            jax.ShapeDtypeStruct((grid, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # 3-D partials: last-two block dims (1, c) equal the array's —
            # Mosaic requires (8, 128)-divisible OR full-dim blocks
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * n * c,
            bytes_accessed=3 * n * c * x2.dtype.itemsize,
            transcendentals=n,
        ),
    )(x2, gamma, dy2)
    return dx, dg_part.sum((0, 1)), db_part.sum((0, 1))


def layer_norm_ref(x, gamma, beta, eps=1e-6):
    """Pure-jnp reference (fp32 statistics, like nn.LayerNorm defaults)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def supported(shape, backend: str | None = None) -> int:
    """Return the row-block size the kernel would use, or 0 if unsupported."""
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return 0
    c = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    if c > _MAX_C or n == 0:
        return 0
    return _pick_rows(n, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(x2, gamma, beta, eps, rows):
    return _run_fwd(x2, gamma, beta, eps, rows)


def _fused_fwd(x2, gamma, beta, eps, rows):
    return _run_fwd(x2, gamma, beta, eps, rows), (x2, gamma)


def _fused_bwd(eps, rows, res, dy):
    x2, gamma = res
    dx, dgamma, dbeta = _run_bwd(x2, gamma, dy, eps, rows)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_layer_norm(x, gamma, beta, eps=1e-6):
    """LayerNorm over the trailing axis; Pallas on TPU, jnp elsewhere.
    Output dtype == x dtype; statistics in fp32 either way."""
    rows = supported(x.shape)
    if rows == 0:
        return layer_norm_ref(x, gamma, beta, eps)
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    y = _fused(x2, gamma, beta, float(eps), rows)
    return y.reshape(orig_shape)
