"""On-chip benchmark: fused Pallas 1x1-conv+BN-stats vs XLA's formulation
(matmul -> separate stat reduce fusion), at every ResNet-50 1x1 shape
(batch 128, the bench operating point).

Timing per BREAKDOWN.md rules: K-step lax.scan with a perturbed carry chained
through the input (defeats relay memoization + hoisting), fetch-sync, and the
(K_hi - K_lo) difference quotient. ALL outputs (y consumed via a cheap
contraction + stats) feed the carry so nothing is DCE'd.

Writes benchmarks/conv1x1_bn_bench.json. Run: python benchmarks/bench_conv1x1_bn.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K_LO, K_HI = 8, 24

# (M = B*H*W, K, N) for every distinct ResNet-50 1x1 conv at B=128, 224^2
SHAPES = [
    (401408, 64, 256),    # stage1 expand
    (401408, 256, 64),    # stage1 reduce
    (100352, 128, 512),   # stage2 expand
    (100352, 512, 128),   # stage2 reduce
    (25088, 256, 1024),   # stage3 expand
    (25088, 1024, 256),   # stage3 reduce
    (6272, 512, 2048),    # stage4 expand
    (6272, 2048, 512),    # stage4 reduce
]


def time_fn(make_scanned, x0, carry0):
    import jax

    times = {}
    for K in (K_LO, K_HI):
        f = jax.jit(make_scanned(K))
        np.asarray(f(carry0, x0))  # compile + fetch
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            np.asarray(f(carry0 + np.float32(1e-6 * (rep + 1)), x0))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imageclassification_tpu.ops.pallas_conv1x1_bn import (
        conv1x1_bn_stats, xla_reference,
    )

    results = {}
    rng = np.random.default_rng(0)
    for (m, k, n) in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, (k,)), jnp.float32)
        shift = jnp.asarray(rng.normal(0, 0.3, (k,)), jnp.float32)
        probe = jnp.asarray(rng.normal(0, 1, (n,)), jnp.float32)

        def consume(y, stats):
            # consume every output cheaply: nothing may be DCE'd
            return (y[::4097].astype(jnp.float32).sum()
                    + (stats * probe).sum()) * 1e-9

        def mk(fn, fused_in):
            def make(K):
                def scanned(c, xx):
                    def body(cc, _):
                        xin = xx + cc.astype(xx.dtype)
                        if fused_in:
                            y, stats = fn(xin, w, scale, shift)
                        else:
                            y, stats = fn(xin, w)
                        return cc * 0.5 + consume(y, stats), ()
                    return jax.lax.scan(body, c, None, length=K)[0]
                return scanned
            return make

        row = {}
        for name, fn, fused_in in (
            ("xla", xla_reference, False),
            ("pallas", conv1x1_bn_stats, False),
            ("xla_bn_in", xla_reference, True),
            ("pallas_bn_in", conv1x1_bn_stats, True),
        ):
            per = time_fn(mk(fn, fused_in), x, jnp.float32(0.0))
            row[name] = round(per * 1e3, 4)
        gb = (m * k + k * n + m * n) * 2 / 1e9
        row["min_traffic_ms"] = round(gb / 0.819, 3)  # 819 GB/s HBM
        row["flops_ms"] = round(2 * m * k * n / 197e12 * 1e3, 4)  # bf16 peak
        results[f"{m}x{k}x{n}"] = row
        print(f"{m}x{k}x{n}", row, flush=True)

    out = Path(__file__).parent / "conv1x1_bn_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
