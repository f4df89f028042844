"""Where does the step time go? Honest per-variant timing on the real chip.

The tunneled relay memoizes executions and pipelines dispatch, so host-side
per-call timing of small pure functions reports impossible speeds. Every
variant here is therefore measured as ONE device-side `lax.scan` over K
chained steps (the carry forces real sequential compute), and the per-step
time is the difference quotient between two scan lengths — fixed dispatch/
transfer overhead cancels:

    per_step = (T(K_hi) - T(K_lo)) / (K_hi - K_lo)

Variants:
  fwd           forward only, train=False (carry: input perturbed by logits)
  fwdbwd        value_and_grad + SGD apply (carry: params/opt chain)
  aug           augmentation pipeline alone (carry: key folds, image perturbed)
  step_noparity full train step with train_acc_mode='mixed'
  step_full     full train step, bench parity config (second forward included)

Writes benchmarks/profile_<batch>.json with ms/step, img/s, XLA cost-analysis
FLOPs, and MFU vs the v5e bf16 peak.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
K_LO, K_HI = 8, 24


def _cost_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/imgcls_tpu_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.data.augment import AugmentPipeline
    from imageclassification_tpu.data.mixup import build_mixup
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    size = 224
    num_classes = 1000

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, num_classes, (batch,)), jnp.int32)
    data = {"image": images_u8, "label": labels}
    x_norm = jnp.asarray(rng.normal(0, 1, (batch, size, size, 3)), jnp.float32)

    model = create_model("resnet50", num_classes=num_classes, half_precision=True)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, size, size, 3), jnp.float32), train=False,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    results = {}

    def run_scan_pair(make_scanned, init_carry, label):
        """Time scan(K_LO) and scan(K_HI) (fresh inputs each, relay can't
        replay), return honest per-step seconds + flops-per-step from cost
        analysis of the K_HI executable."""
        times = {}
        flops_per_step = 0.0
        for K in (K_LO, K_HI):
            fn = jax.jit(make_scanned(K), donate_argnums=(0,))
            lowered = fn.lower(init_carry())
            compiled = lowered.compile()
            if K == K_HI:
                flops_per_step = _cost_flops(compiled) / K
            # one warm call to ensure no compile in the timed one
            jax.block_until_ready(compiled(init_carry()))
            best = float("inf")
            for _ in range(3):
                c = init_carry()
                jax.block_until_ready(c)
                t0 = time.perf_counter()
                out = compiled(c)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per_step = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
        ips = batch / per_step
        mfu = flops_per_step / per_step / V5E_BF16_PEAK if flops_per_step else 0.0
        results[label] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "images_per_sec": round(ips, 1),
            "flops_per_step": flops_per_step,
            "mfu_vs_bf16_peak": round(mfu, 4),
            "t_lo_s": round(times[K_LO], 4),
            "t_hi_s": round(times[K_HI], 4),
        }
        print(
            f"{label:14s} {per_step * 1e3:8.2f} ms  {ips:9.1f} img/s  "
            f"MFU={mfu * 100:5.1f}%",
            flush=True,
        )

    # ---- fwd -------------------------------------------------------------
    def make_fwd(K):
        def scanned(x):
            def body(carry, _):
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    carry, train=False,
                )
                # data dependency chains iterations; perturbation ~1e-20
                return carry + logits.sum() * 1e-20, logits.mean()
            return jax.lax.scan(body, x, None, length=K)[1]
        return scanned

    run_scan_pair(make_fwd, lambda: x_norm + 0.0, "fwd")

    # ---- fwdbwd ------------------------------------------------------------
    import optax

    tx = create_optimizer("sgd", 0.1, 0.0)

    def loss_fn(p, bs, x, y):
        logits, mut = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            rngs={"dropout": jax.random.key(0)}, mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y
        ).mean()
        return loss, mut["batch_stats"]

    def make_fwdbwd(K):
        def scanned(carry0):
            def body(carry, _):
                p, bs, opt = carry
                (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, bs, x_norm, labels
                )
                updates, nopt = tx.update(grads, opt, p)
                return (optax.apply_updates(p, updates), nbs, nopt), loss
            return jax.lax.scan(body, carry0, None, length=K)[1]
        return scanned

    run_scan_pair(
        make_fwdbwd,
        lambda: jax.tree.map(jnp.copy, (params, batch_stats, tx.init(params))),
        "fwdbwd",
    )

    # ---- aug ----------------------------------------------------------------
    cfg = TrainConfig(
        model="resnet50", input_size=size, batch_size=batch,
        mixup=0.8, smoothing=0.1, reprob=0.25, color_jitter=0.3,
        half_precision=True,
    )
    pipe = AugmentPipeline(cfg)

    def make_aug(K):
        def scanned(x0):
            def body(carry, i):
                x, key = carry
                out = pipe(x.astype(jnp.uint8), jax.random.fold_in(key, i))
                # chain: next input depends on this output
                nxt = jnp.clip(x + (out.sum() * 1e-20), 0, 255)
                return (nxt, key), out.mean()
            return jax.lax.scan(
                body, (x0, jax.random.key(0)), jnp.arange(K)
            )[1]
        return scanned

    run_scan_pair(
        make_aug, lambda: images_u8.astype(jnp.float32) + 0.0, "aug"
    )

    # ---- full train steps ----------------------------------------------------
    lr = np.full(1000, 1e-3, np.float32)
    wd = np.full(1000, 5e-4, np.float32)
    mix = build_mixup(cfg, num_classes)

    for label, acc_mode in (("step_noparity", "mixed"), ("step_full", "exact")):
        cfg_v = TrainConfig(
            model="resnet50", input_size=size, batch_size=batch,
            mixup=0.8, smoothing=0.1, reprob=0.25, color_jitter=0.3,
            half_precision=True, train_acc_mode=acc_mode,
        )
        tx_v = create_optimizer(cfg_v.opt, cfg_v.lr, cfg_v.weight_decay)
        step_fn = build_train_step(model, tx_v, cfg_v, num_classes, mix, lr, wd)

        def make_step(K, step_fn=step_fn):
            def scanned(state0):
                def body(state, _):
                    state, metrics = step_fn(state, data, jax.random.key(1))
                    # keep EVERY metric live: returning only the loss lets
                    # XLA dead-code-eliminate the metric computations,
                    # including exact-mode's parity second forward (the bug
                    # that made step_full measure equal to step_noparity)
                    return state, metrics
                return jax.lax.scan(body, state0, None, length=K)[1]
            return scanned

        def fresh_state(tx_v=tx_v):
            return create_train_state(
                model, tx_v, jax.random.key(0), (1, size, size, 3)
            )

        run_scan_pair(make_step, fresh_state, label)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"profile_{batch}.json"
    )
    payload = {
        "batch": batch,
        "k_lo": K_LO,
        "k_hi": K_HI,
        "device": str(jax.devices()[0]),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
