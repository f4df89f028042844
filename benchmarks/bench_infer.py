"""Serving benchmark: ResNet-50 inference latency/throughput on one chip.

The reference's serving path is ONNX→TensorRT engines (modelchange.py:68-153);
here the serialized StableHLO artifact (modelchange.pth2stablehlo / pth2aot)
IS the serving format — XLA consumes it directly. This measures the jitted
eval forward (bf16, NHWC, normalize included) across batch sizes, scan-chained
with fetch-sync (see BREAKDOWN.md tunnel caveats).

Writes benchmarks/infer_bench.json:  batch → {ms_per_batch, images_per_sec,
p50_latency_ms_estimate}.  Run: python benchmarks/bench_infer.py
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
BATCHES = (1, 8, 32, 128)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imageclassification_tpu.data.augment import eval_preprocess
    from imageclassification_tpu.models import create_model

    model = create_model("resnet50", num_classes=1000, half_precision=True)
    v = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 224, 224, 3), jnp.float32), train=False,
    )
    params, bstats = v["params"], v["batch_stats"]

    results = {}
    rng = np.random.default_rng(0)
    for batch in BATCHES:
        x_u8 = jnp.asarray(
            rng.integers(0, 255, (batch, 224, 224, 3)), jnp.uint8
        )

        def make(K):
            def scanned(carry, x):
                def body(c, _):
                    logits = model.apply(
                        {"params": params, "batch_stats": bstats},
                        eval_preprocess(x) + c * 1e-12, train=False,
                    )
                    m = logits.astype(jnp.float32).mean()
                    return c + m * 1e-7, m
                return jax.lax.scan(body, carry, None, length=K)[1]
            return jax.jit(scanned)

        times = {}
        for K in (K_LO, K_HI):
            f = make(K)
            np.asarray(f(jnp.float32(0.0), x_u8))  # compile + fetch
            best = float("inf")
            for rep in range(3):
                c0 = jnp.float32(1e-5 * (rep + 1))
                t0 = time.perf_counter()
                np.asarray(f(c0, x_u8))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
        results[str(batch)] = {
            "ms_per_batch": round(per * 1e3, 3),
            "images_per_sec": round(batch / per, 1),
        }
        print(batch, results[str(batch)], flush=True)

    out = Path(__file__).parent / "infer_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
