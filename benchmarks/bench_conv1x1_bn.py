"""On-chip benchmark: fused Pallas 1x1-conv+BN-stats vs XLA, measured on the
pattern the model actually executes — a CHAIN of
    conv1x1 -> batch stats -> normalize+ReLU -> conv1x1 -> batch stats
so the intermediate conv output must be materialized (it feeds both the stat
reduce and the next conv), exactly like a ResNet bottleneck's 1x1 pair.

  xla    : y1 = x@W1; stats(y1); z = relu(bn(y1)); y2 = z@W2; stats(y2)
           (XLA materializes y1 and RE-READS it in a separate reduce fusion —
           the 23.8 ms `convert_reduce_fusion` band of the train step)
  pallas : (y1, s1) = fused_matmul_stats(x, W1)           # stats in epilogue
           (y2, s2) = fused_matmul_stats(y1, W2, bn-apply prologue)
           (normalize+ReLU fused into the second kernel's input read)

Timing: K-step lax.scan with perturbed carry (defeats relay memoization +
hoisting), fetch-sync, (K_hi-K_lo)/  difference quotient — BREAKDOWN.md rules.

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

K_LO, K_HI = 16, 80
EPS = 1e-5

# (M = B*H*W, K, N) pairs: chain is K -> N -> K (reduce then expand),
# matching ResNet-50's bottleneck 1x1 pair at B=128, 224^2
SHAPES = [
    (401408, 256, 64),    # stage1: 256 -> 64 -> 256
    (100352, 512, 128),   # stage2
    (25088, 1024, 256),   # stage3
    (6272, 2048, 512),    # stage4
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imageclassification_tpu.ops.pallas_conv1x1_bn import conv1x1_bn_stats

    def folded(stats, m):
        mean = stats[0] / m
        var = stats[1] / m - mean * mean
        scale = jax.lax.rsqrt(var + EPS)
        return scale, -mean * scale

    results = {}
    rng = np.random.default_rng(0)
    for (m, k, n) in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 0.05, (n, k)), jnp.bfloat16)
        probe = jnp.asarray(rng.normal(0, 1, (k,)), jnp.float32)

        def xla_chain(xin):
            y1 = jnp.dot(xin, w1, preferred_element_type=jnp.float32)
            y1 = y1.astype(jnp.bfloat16)
            s0 = jnp.sum(y1.astype(jnp.float32), axis=0)
            s1 = jnp.sum(jnp.square(y1.astype(jnp.float32)), axis=0)
            sc, sh = folded(jnp.stack([s0, s1]), m)
            z = jnp.maximum(y1.astype(jnp.float32) * sc + sh, 0.0)
            y2 = jnp.dot(z.astype(jnp.bfloat16), w2,
                         preferred_element_type=jnp.float32)
            y2 = y2.astype(jnp.bfloat16)
            t0 = jnp.sum(y2.astype(jnp.float32), axis=0)
            t1 = jnp.sum(jnp.square(y2.astype(jnp.float32)), axis=0)
            return y2, jnp.stack([t0, t1])

        def pallas_chain(xin):
            y1, s = conv1x1_bn_stats(xin, w1)
            sc, sh = folded(s, m)
            y2, t = conv1x1_bn_stats(y1, w2, sc, sh, relu_in=True)
            return y2, t

        def consume(y2, t):
            # consume both outputs; y2 feeds the carry through a column probe
            # so its values (not just its stats) are live
            return (jnp.sum(y2[0].astype(jnp.float32) * probe)
                    + jnp.sum(t[0] * probe)) * 1e-9

        def mk(chain):
            def make(K):
                def scanned(c, xx):
                    def body(cc, _):
                        y2, t = chain(xx + cc.astype(xx.dtype))
                        return cc * 0.5 + consume(y2, t), ()
                    return jax.lax.scan(body, c, None, length=K)[0]
                return scanned
            return make

        row = {}
        for name, chain in (("xla", xla_chain), ("pallas", pallas_chain)):
            times = {}
            for K in (K_LO, K_HI):
                print(f"  {m}x{k}x{n} {name} K={K}: compiling...", flush=True)
                f = jax.jit(mk(chain)(K))
                t0 = time.perf_counter()
                np.asarray(f(jnp.float32(0.0), x))  # compile + fetch
                print(f"    compiled+ran in {time.perf_counter()-t0:.1f}s",
                      flush=True)
                best = float("inf")
                for rep in range(4):
                    t0 = time.perf_counter()
                    np.asarray(f(jnp.float32(1e-6 * (rep + 1)), x))
                    best = min(best, time.perf_counter() - t0)
                times[K] = best
            row[name] = round((times[K_HI] - times[K_LO]) / (K_HI - K_LO) * 1e3, 4)
        # chain traffic lower bound: read x, write y1, read y1, write y2
        # (+ W tiles, negligible) — the FUSED ideal where stats ride epilogues
        gb = (2 * m * k + 2 * m * n) * 2 / 1e9
        row["min_traffic_ms"] = round(gb / 0.819, 3)
        # XLA's formulation adds 2 more passes over y1/y2 for the stat reads
        gb_xla = (3 * m * k + 3 * m * n) * 2 / 1e9
        row["xla_traffic_ms"] = round(gb_xla / 0.819, 3)
        row["speedup"] = round(row["xla"] / row["pallas"], 3) if row["pallas"] else None
        results[f"{m}x{k}x{n}"] = row
        print(f"{m}x{k}x{n}", row, flush=True)

    out = Path(__file__).parent / "conv1x1_bn_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
