"""Throughput benchmark: ResNet-50 training images/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

## Roofline (the vs_baseline denominator)

v5e bf16 peak = 197 TFLOP/s. ResNet-50 at 224² is 4.1 G multiply-accumulates
per image forward — i.e. 8.2 GFLOP with the 2-flops-per-MAC convention XLA's
cost analysis uses (measured: lowering the batch-128 forward reports
1.05e12 flops = 8.2 GFLOP/img; see benchmarks/profile_128.json). Training is
~3x forward (fwd + dgrad + wgrad):

    roofline = 197e12 / (3 x 8.2e9) = 8.0k img/s/chip,  target = 0.9 x that.

(Round-1 bench divided by 4.1e9, silently treating MACs as FLOPs and
doubling the target; corrected here with the cost-analysis receipt.)

## Measurement

The timed region is the full fused train step (augmentation + mixup +
fwd/bwd + optimizer + metrics) — the same step train.py runs. Iterations are
chained through the donated TrainState (the optimizer state advances, so the
tunneled relay cannot replay memoized executions) and run K steps per
dispatch inside jax.lax.scan: the tunnel adds ~15 ms of host round-trip per
dispatch, which is a harness artifact (a real TPU-VM host dispatches in
~100 us), so per-step time is the difference quotient between two scan
lengths. Set BENCH_MODE=dispatch to measure the host-loop instead.

BENCH_SWEEP=1 sweeps batch x variant and writes benchmarks/bench_sweep.json
(the instrument behind benchmarks/BREAKDOWN.md); the single driver line is
always printed last.

Why synthetic input: this bench container exposes ONE CPU core, capping host
JPEG decode at ~190 img/s regardless of loader design; measured separately,
host->device transfer sustains ~13k img/s and decode is 5.2 ms/img/core, so
on a real TPU-VM host (200+ vCPUs) the input pipeline out-runs the step. The
step itself is the chip-bound quantity this metric tracks.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

V5E_BF16_PEAK = 197e12
TRAIN_FLOPS_PER_IMG = 3 * 8.2e9          # fwd+dgrad+wgrad, 2 flops per MAC
ROOFLINE_IMG_S = V5E_BF16_PEAK / TRAIN_FLOPS_PER_IMG
TARGET_IMG_S = 0.9 * ROOFLINE_IMG_S


def _build(batch, acc_mode="exact", model_name="resnet50"):
    import jax

    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.data.mixup import build_mixup
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer

    size, num_classes = 224, 1000
    cfg = TrainConfig(
        model=model_name, input_size=size, batch_size=batch,
        mixup=0.8, smoothing=0.1, reprob=0.25, color_jitter=0.3,
        half_precision=True, train_acc_mode=acc_mode,
    )
    kwargs = {}
    if model_name.startswith("efficientvit"):
        kwargs["img_size"] = size
    model = create_model(model_name, num_classes=num_classes,
                         half_precision=True, **kwargs)
    tx = create_optimizer(cfg.opt, cfg.lr, cfg.weight_decay)
    state = create_train_state(model, tx, jax.random.key(0),
                               (1, size, size, 3))
    mix = build_mixup(cfg, num_classes)
    lr = np.full(1000, 1e-3, np.float32)
    wd = np.full(1000, 5e-4, np.float32)
    step_fn = build_train_step(model, tx, cfg, num_classes, mix, lr, wd)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    data = {
        "image": jnp.asarray(
            rng.integers(0, 255, (batch, size, size, 3)), jnp.uint8
        ),
        "label": jnp.asarray(rng.integers(0, num_classes, (batch,)), jnp.int32),
    }

    def fresh_state():
        return create_train_state(model, tx, jax.random.key(0),
                                  (1, size, size, 3))

    return step_fn, fresh_state, data


def time_scan(step_fn, fresh_state, data, k_lo=8, k_hi=24):
    """Chip-bound per-step seconds: K steps per dispatch, difference quotient
    between two scan lengths cancels dispatch/transfer overhead."""
    import jax

    def make(K):
        def scanned(state, data):
            def body(st, _):
                st, metrics = step_fn(st, data, jax.random.key(1))
                return st, metrics["loss"]
            return jax.lax.scan(body, state, None, length=K)[1]
        return jax.jit(scanned, donate_argnums=(0,))

    times = {}
    for K in (k_lo, k_hi):
        f = make(K)
        np.asarray(f(fresh_state(), data))  # compile + warm; FETCH to sync
        best = float("inf")
        for _ in range(3):
            st = fresh_state()
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            # fetching the [K] losses is the only reliable sync on tunneled
            # relays (block_until_ready can return without a round trip);
            # the constant fetch RTT cancels in the K_hi-K_lo difference
            np.asarray(f(st, data))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def time_dispatch(step_fn, fresh_state, data, iters=30):
    """Host-loop per-step seconds (includes per-dispatch tunnel RTT)."""
    import jax

    step = jax.jit(step_fn, donate_argnums=(0,))
    state = fresh_state()
    key = jax.random.key(1)
    for _ in range(3):
        state, metrics = step(state, data, key)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, key)
    jax.block_until_ready(metrics)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/imgcls_tpu_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    mode = os.environ.get("BENCH_MODE", "scan")

    if os.environ.get("BENCH_SWEEP"):
        sweep = {}
        for b in (64, 128, 256):
            for acc_mode in ("exact", "mixed"):
                step_fn, fresh_state, data = _build(b, acc_mode)
                per = time_scan(step_fn, fresh_state, data)
                key = f"batch{b}_{acc_mode}"
                sweep[key] = {
                    "ms_per_step": round(per * 1e3, 2),
                    "images_per_sec": round(b / per, 1),
                    "mfu": round(b / per * TRAIN_FLOPS_PER_IMG / V5E_BF16_PEAK, 4),
                }
                print(key, sweep[key], flush=True)
        out = os.path.join("benchmarks", "bench_sweep.json")
        with open(out, "w") as f:
            json.dump(sweep, f, indent=2)

    if os.environ.get("BENCH_MODELS"):
        # per-family training throughput (img/s only — FLOPs differ per model)
        rows = {}
        for name in os.environ["BENCH_MODELS"].split(","):
            name = name.strip()
            step_fn, fresh_state, data = _build(batch, model_name=name)
            per = time_scan(step_fn, fresh_state, data)
            rows[name] = {
                "batch": batch,
                "ms_per_step": round(per * 1e3, 2),
                "images_per_sec": round(batch / per, 1),
            }
            print(name, rows[name], flush=True)
        out = os.path.join("benchmarks", "bench_models.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=2)

    step_fn, fresh_state, data = _build(batch)
    if mode == "dispatch":
        per = time_dispatch(step_fn, fresh_state, data)
    else:
        per = time_scan(step_fn, fresh_state, data)
    images_per_sec = batch / per
    print(json.dumps({
        "metric": "resnet50_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / TARGET_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
