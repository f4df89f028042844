"""Where does Swin-T's step time go? — the receipt-grade decomposition
round 3 owed (VERDICT r3 weak #2: 579 img/s ~ 5% MFU with a one-line
"architecture-intrinsic" excuse).

Measures, on chip (scan-difference timing, carries chained to defeat the
relay's replay memoization — BREAKDOWN.md methodology rules):

1. per-stage SwinBlock fwd / fwd+bwd at the real feature-map geometries
   (B=128, 224² input: 56²/96, 28²/192, 14²/384, 7²/768)
2. the isolated batched window-attention dots ([B·nW·h, 49, 32] q @ kᵀ and
   attn @ v) — the small-matmul MFU question: does XLA batch them onto the
   MXU or serialize?
3. the same FLOPs as ONE dense MXU-friendly matmul (the ideal-batched
   bound's compute term), plus the analytic traffic bound

Writes benchmarks/swin_bench.json. Reference anchor: the Swin rows of the
published tables this family serves (/root/reference/semantic_segmentation/
README.md:18-23 use Swin-comparable backbones via timm).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("SWIN_B", "128"))
K_LO = int(os.environ.get("SWIN_K_LO", "8"))
K_HI = int(os.environ.get("SWIN_K_HI", "40"))
V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9

# swin_tiny stage geometry at 224²: (H, C, heads, n_blocks)
STAGES = [(56, 96, 3, 2), (28, 192, 6, 2), (14, 384, 12, 6), (7, 768, 24, 2)]
W = 7
N = W * W


def _scan_time(body, carry0, label):
    """Per-iteration seconds via the K_HI-K_LO difference quotient."""
    import jax

    times = {}
    for K in (K_LO, K_HI):
        scanned = jax.jit(functools.partial(
            lambda c, K: jax.lax.scan(body, c, None, length=K), K=K))
        np.asarray(jax.tree.leaves(scanned(carry0)[1])[0])  # compile + sync
        best = float("inf")
        for rep in range(3):
            c = jax.tree.map(
                lambda a: a + np.asarray(1e-3 * (rep + 1), a.dtype), carry0)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(scanned(c)[1])[0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
    print(f"{label:44s} {per * 1e3:9.4f} ms", flush=True)
    return per


def block_times(stage_idx: int, shift: bool, grad: bool):
    """Full SwinBlock at stage geometry (params as jit args, chained x)."""
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.models.swin import SwinBlock

    H, C, heads, _ = STAGES[stage_idx]
    # pinned to the legacy per-window layout: this instrument documents the
    # decomposition that motivated the merged layout (swin_layout_bench.json)
    blk = SwinBlock(dim=C, num_heads=heads, window=W,
                    shift=W // 2 if shift else 0, attn_layout="legacy",
                    dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
    params = blk.init({"params": jax.random.key(0)}, x0[:1])["params"]

    if grad:
        def loss(p, x):
            return jnp.sum(blk.apply({"params": p}, x).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        def body(carry, _):
            p, x = carry
            dp, dx = g(p, x)
            p = jax.tree.map(lambda a, b: a + 1e-6 * b.astype(a.dtype), p, dp)
            return (p, x + 1e-6 * dx.astype(x.dtype)), x[0, 0, 0, 0]
        carry0 = (params, x0)
    else:
        def body(carry, _):
            x, = carry
            y = blk.apply({"params": params}, x)
            return (x + 1e-6 * y,), y[0, 0, 0, 0]
        carry0 = (x0,)
    tag = f"s{stage_idx} {H}x{H}xC{C} {'sw' if shift else 'w'}msa {'fwdbwd' if grad else 'fwd'}"
    return _scan_time(body, carry0, f"block {tag}")


def attn_dot_times(stage_idx: int, grad: bool):
    """Isolated window attention core: softmax(q@kᵀ·s + b) @ v at the
    stage's [B·nW, h, 49, hd] shape — the small-matmul MFU probe."""
    import jax
    import jax.numpy as jnp

    H, C, heads, _ = STAGES[stage_idx]
    nW = (H // W) ** 2 if H > W else 1
    hd = C // heads
    B_ = B * nW
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B_, heads, N, hd)), jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(size=(B_, heads, N, hd)), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(B_, heads, N, hd)), jnp.bfloat16)

    def attn(q, k, v):
        a = jnp.einsum("bhnk,bhmk->bhnm", q * (hd ** -0.5), k)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhnm,bhmk->bhnk", a, v)

    if grad:
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2))

        def body(carry, _):
            q, k, v = carry
            dq, dk, dv = g(q, k, v)
            return (q + 1e-6 * dq.astype(q.dtype), k, v), dq[0, 0, 0, 0]
    else:
        def body(carry, _):
            q, k, v = carry
            y = attn(q, k, v)
            return (q + 1e-6 * y, k, v), y[0, 0, 0, 0]

    per = _scan_time(body, (q0, k0, v0),
                     f"attn-core s{stage_idx} [{B_},{heads},{N},{hd}] "
                     f"{'fwdbwd' if grad else 'fwd'}")
    flops = 2 * B_ * heads * N * N * hd * 2        # qk + av, 2 flops/MAC
    if grad:
        flops *= 3                                  # fwd + 2 bwd dots each
    traffic = (3 * B_ * heads * N * hd * 2          # q,k,v read (bf16)
               + B_ * heads * N * hd * 2            # out write
               + 2 * B_ * heads * N * N * 2)        # attn matrix w+r (bf16)
    if grad:
        traffic *= 3
    return {
        "ms": round(per * 1e3, 4),
        "mfu": round(flops / per / V5E_BF16_PEAK, 4),
        "tflops": round(flops / per / 1e12, 2),
        "hbm_frac": round(traffic / per / V5E_HBM_BW, 4),
        "bound_ms": round(max(flops / V5E_BF16_PEAK,
                              traffic / V5E_HBM_BW) * 1e3, 4),
    }


def dense_equiv_time(stage_idx: int):
    """Same attention FLOPs as one MXU-friendly dense matmul: the compute
    ceiling an 'ideal batching' could ever reach."""
    import jax
    import jax.numpy as jnp

    H, C, heads, _ = STAGES[stage_idx]
    nW = (H // W) ** 2 if H > W else 1
    hd = C // heads
    B_ = B * nW
    flops = 2 * B_ * heads * N * N * hd * 2
    # one [M, K] @ [K, K2] with the same flop count, MXU-aligned
    M = B_ * heads * N
    K2 = 2 * N
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.normal(size=(M, hd)), jnp.bfloat16)
    b0 = jnp.asarray(rng.normal(size=(hd, K2)), jnp.bfloat16)
    assert 2 * M * hd * K2 == flops

    def body(carry, _):
        a, b = carry
        y = a @ b
        return (a + 1e-6 * y[:, :hd], b), y[0, 0]

    per = _scan_time(body, (a0, b0), f"dense-equiv s{stage_idx} [{M}x{hd}x{K2}]")
    return {"ms": round(per * 1e3, 4),
            "mfu": round(flops / per / V5E_BF16_PEAK, 4)}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = {"B": B}
    only = os.environ.get("SWIN_ONLY", "")
    for s in range(4):
        if only and str(s) not in only.split(","):
            continue
        res = {}
        res["attn_fwd"] = attn_dot_times(s, grad=False)
        res["attn_fwdbwd"] = attn_dot_times(s, grad=True)
        res["dense_equiv"] = dense_equiv_time(s)
        res["block_fwd_ms"] = round(block_times(s, False, False) * 1e3, 3)
        res["block_fwdbwd_ms"] = round(block_times(s, False, True) * 1e3, 3)
        res["block_sw_fwdbwd_ms"] = round(block_times(s, True, True) * 1e3, 3)
        results[f"stage{s}"] = res
        out = Path(__file__).parent / "swin_bench.json"
        out.write_text(json.dumps(results, indent=2))
        print(f"stage {s} done -> {out}", flush=True)


if __name__ == "__main__":
    main()
