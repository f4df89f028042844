"""ResNet-50 backward bound: is 35% MFU within ~1.2x of a properly-derived
full-step bound, or is the 40-55% calibration band reachable? (VERDICT r3
next #4, option b.)

Round 3 proved the FORWARD BN-stat chain sits AT its ideal-fusion traffic
bound (conv1x1_bn_bench.json). This instrument applies the same
measure-vs-bound method to the full block INCLUDING backward:

  per stage: one in-stage Bottleneck (train-mode BN), fwd and fwd+bwd via
  scan-difference; vs an idealized perfect-fusion bound:
    T_bound = max(T_mxu, T_hbm)
    T_mxu  = conv FLOPs (fwd = 1x, +dgrad +wgrad = 3x) / 197 TFLOP/s
    T_hbm  = minimum bf16 activation traffic assuming IDEAL kernels:
             fwd: every conv output written once + read once (stats,
             normalize, ReLU all fused free); bwd: every gradient written
             once + read once + one re-read of the forward residual
             (wgrad/BN-bwd) — the same 2-pass fwd / 3-pass bwd accounting
             as bench.py's composite roofline.

  model bound = sum over the 16 blocks (per-stage measured x block count)
  compared against the measured fwd+bwd band of the train step.

Writes benchmarks/resnet_bwd_bound.json.
Reference for what the step replaces: /root/reference/engine.py:40-97.
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

B = int(os.environ.get("RN_B", "128"))
V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9
K_LO = int(os.environ.get("RN_K_LO", "8"))
K_HI = int(os.environ.get("RN_K_HI", "40"))

# (H, filters, in_ch, n_blocks) — in-stage (non-downsample) geometry, 224²
STAGES = [(56, 64, 256, 3), (28, 128, 512, 4), (14, 256, 1024, 6),
          (7, 512, 2048, 3)]


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


def block_flops(H, w, in_ch):
    M = B * H * H
    return 2 * M * (in_ch * w + 9 * w * w + w * 4 * w)  # assumes in=4w out


def block_ideal_bytes(H, w, in_ch, grad):
    """Minimum bf16 traffic of an ideally-fused block (see module doc)."""
    M = B * H * H
    acts = M * (w + w + 4 * w)          # the three conv outputs
    x_in = M * in_ch
    fwd = (x_in                          # read input (once; residual read
           + acts * 2                    # fused into the final add)
           + x_in) * 2                   # residual re-read for the add; bf16
    if not grad:
        return fwd
    bwd = (acts + x_in) * 3 * 2          # grad w+r + fwd-residual re-read
    return fwd + bwd


def time_block(stage_idx, grad):
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.models.resnet import Bottleneck

    H, w, in_ch, _ = STAGES[stage_idx]
    blk = Bottleneck(filters=w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, H, H, in_ch)), jnp.bfloat16)
    variables = blk.init({"params": jax.random.key(0)}, x0[:1], train=True)
    params, stats0 = variables["params"], variables["batch_stats"]

    if grad:
        def loss(p, x, bs):
            y, new = blk.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2), new["batch_stats"]

        g = jax.grad(loss, argnums=(0, 1), has_aux=True)

        def body(carry, _):
            p, x, bs = carry
            (dp, dx), bs = g(p, x, bs)
            p = jax.tree.map(lambda a, b: a + 1e-6 * b.astype(a.dtype), p, dp)
            return (p, x + 1e-6 * dx.astype(x.dtype), bs), dx[0, 0, 0, 0]
        carry0 = (params, x0, stats0)
    else:
        def body(carry, _):
            x, bs = carry
            y, new = blk.apply({"params": params, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
            return (x + 1e-6 * y[:, :, :, :in_ch] if y.shape[-1] == in_ch
                    else x, new["batch_stats"]), y[0, 0, 0, 0]
        carry0 = (x0, stats0)

    tag = f"s{stage_idx + 1} {H}²x{in_ch} {'fwdbwd' if grad else 'fwd'}"
    per = _scan_time(body, carry0, f"bottleneck {tag}")
    flops = block_flops(H, w, in_ch) * (3 if grad else 1)
    t_mxu = flops / V5E_BF16_PEAK
    t_hbm = block_ideal_bytes(H, w, in_ch, grad) / V5E_HBM_BW
    return {
        "ms": round(per * 1e3, 4),
        "bound_ms": round(max(t_mxu, t_hbm) * 1e3, 4),
        "bound_term": "hbm" if t_hbm > t_mxu else "mxu",
        "vs_bound": round(per / max(t_mxu, t_hbm), 3),
        "mfu": round(flops / per / V5E_BF16_PEAK, 4),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"B": B, "stages": {}}
    total_ms = total_bound = 0.0
    for s in range(4):
        row = {
            "fwd": time_block(s, grad=False),
            "fwdbwd": time_block(s, grad=True),
            "n_blocks": STAGES[s][3],
        }
        out["stages"][f"stage{s + 1}"] = row
        total_ms += row["fwdbwd"]["ms"] * row["n_blocks"]
        total_bound += row["fwdbwd"]["bound_ms"] * row["n_blocks"]
        path = Path(__file__).parent / "resnet_bwd_bound.json"
        out["sum_16_blocks_fwdbwd_ms"] = round(total_ms, 2)
        out["sum_16_blocks_bound_ms"] = round(total_bound, 2)
        out["sum_vs_bound"] = round(total_ms / max(total_bound, 1e-9), 3)
        path.write_text(json.dumps(out, indent=2))
        print(f"stage {s + 1} done -> {path}", flush=True)
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))


if __name__ == "__main__":
    main()
