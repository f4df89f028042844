"""Pallas 7x7 depthwise conv vs XLA grouped conv, at ConvNeXt shapes
(VERDICT round-1 item 8: measure on the real chip; keep the winner).

Scan-chained fwd and fwd+bwd timing per (shape, impl); writes
benchmarks/dwconv_bench.json. Run on the TPU:  python benchmarks/bench_dwconv.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [  # ConvNeXt-T stage maps at batch 128
    (128, 56, 56, 96),
    (128, 28, 28, 192),
    (128, 14, 14, 384),
    (128, 7, 7, 768),
]
K_LO, K_HI = 8, 24


def time_scan(make_body, init_carry):
    """Scan-difference timing. Synchronize by FETCHING the scan outputs
    (np.asarray) — on the tunneled relay, block_until_ready on small
    device outputs can return without a round trip, collapsing timings."""
    import jax

    times = {}
    for K in (K_LO, K_HI):
        body = make_body()

        def scanned(carry, x):
            def step(c, _):
                return body(c, x)
            return jax.lax.scan(step, carry, None, length=K)[1]

        f = jax.jit(scanned)
        c0, x = init_carry()
        np.asarray(f(c0, x))  # warm (compile) + fetch
        best = float("inf")
        for rep in range(3):
            c0, x = init_carry(1e-5 * (rep + 1))
            jax.block_until_ready((c0, x))
            t0 = time.perf_counter()
            np.asarray(f(c0, x))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imageclassification_tpu.ops import pallas_dwconv as dw

    results = {}
    for B, H, W, C in SHAPES:
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
        w0 = jnp.asarray(rng.normal(0, 0.1, (7, 7, C)), jnp.float32)
        key = f"{H}x{W}x{C}"
        results[key] = {"fits_vmem": dw.fits_vmem(H, W, C, 2)}

        for impl_name, fn in (
            ("pallas", dw.depthwise_conv7x7),
            ("xla", dw.dwconv7x7_reference),
        ):
            if impl_name == "pallas" and not dw.fits_vmem(H, W, C, 2):
                continue

            # forward: fp32 kernel carry, chained through w += eps*mean(out)
            def make_fwd(fn=fn):
                def body(w, x):
                    out = fn(x, w.astype(x.dtype))
                    m = out.astype(jnp.float32).mean()
                    return w + m * 1e-7, m
                return body

            def init(eps=0.0):
                return w0 * (1 + eps), x0

            per_f = time_scan(make_fwd, init)

            # fwd+bwd: SGD on the kernel through the conv
            def make_fb(fn=fn):
                def body(w, x):
                    def loss(wf):
                        return (fn(x, wf.astype(x.dtype))
                                .astype(jnp.float32) ** 2).mean()
                    l, g = jax.value_and_grad(loss)(w)
                    return w - 1e-6 * g, l
                return body

            per_fb = time_scan(make_fb, init)
            results[key][impl_name] = {
                "fwd_ms": round(per_f * 1e3, 3),
                "fwdbwd_ms": round(per_fb * 1e3, 3),
            }
            print(key, impl_name, results[key][impl_name], flush=True)

    out = Path(__file__).parent / "dwconv_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
