"""Throughput benchmark: ResNet-50 training images/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

## Roofline (the vs_baseline denominator)

A roofline is the *binding* hardware bound: time >= max(T_mxu, T_hbm).

Compute term: v5e bf16 peak = 197 TFLOP/s. ResNet-50 at 224² is 8.2 GFLOP
per image forward with the 2-flops-per-MAC convention XLA's cost analysis
uses (measured: lowering the batch-128 forward reports 1.05e12 flops;
BREAKDOWN.md). Training is ~3x forward (fwd + dgrad + wgrad):
T_mxu = 3 x 8.2e9 / 197e12 = 124.9 us/img.

Memory term: training ResNet-50+BN is memory-bound on v5e (819 GB/s HBM) —
see benchmarks/BREAKDOWN.md. Minimum HBM traffic per image, assuming IDEAL
kernels (BN stats fused into conv epilogues, apply fused into consumer
reads — beyond what XLA can express):
  - activations: 11.4e6 elements/img in bf16 = 22.8 MB (counted from the
    model; matches the compiled-HLO census). Fwd: 1 write + 1 read = 2
    passes. Bwd: gradient 1 write + 1 read + one re-read of the forward
    residuals (wgrad/BN-bwd) = 3 passes.
  - optimizer: adamw touches g,m,v,p fp32 ~8 passes x 102 MB / batch.
  - input: uint8 read + fp32 augmented write/read ~ 1.4 MB/img.

The WORKLOAD is the default train step, which in mixup mode includes the
reference's metric forward on the un-mixed batch (engine.py:89-97): one
more forward of FLOPs (4 x 8.2 GFLOP total) and 2 more activation passes
(7 total = 160 MB/img). At B=128:
  T_mxu = 166.5 us/img, T_hbm = 204 us/img (binding)
    roofline = 4.9k img/s/chip, target = 0.9 x that = 4.4k img/s.

(Round-1 divided peak by 3 x 4.1e9 MACs — double-counting the target by
treating MACs as FLOPs. Round-2 corrected that to the pure-FLOP roofline,
then replaced it with this composite: a FLOP-only denominator assumes
train-mode BatchNorm moves zero HBM bytes, which no implementation on
this chip can achieve. The memory term is the binding one and is itself
idealized — it credits kernel fusions XLA cannot currently express, so
100% of this roofline is unreachable in practice.)

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
V5E_HBM_BW = 819e9
TRAIN_FLOPS_PER_IMG = 3 * 8.2e9          # fwd+dgrad+wgrad, 2 flops per MAC
ACT_BYTES_PER_IMG = 11.4e6 * 2           # bf16 activation elements (receipt: BREAKDOWN.md)
PARAM_BYTES = 25.6e6 * 4                 # fp32 params
INPUT_BYTES_PER_IMG = 224 * 224 * 3 * (1 + 2 * 4)   # u8 read + f32 aug W+R


def roofline_img_s(batch: int, acc_mode: str = "exact") -> float:
    """Binding composite roofline (see module docstring): img/s at `batch`.

    The workload is the DEFAULT train step, which in mixup mode includes the
    reference-parity metric forward on the un-mixed batch (engine.py:89-97)
    — one extra forward of FLOPs and 2 extra activation passes. 'mixed'
    drops it (--train_acc_mode mixed)."""
    metric_fwd = 1 if acc_mode == "exact" else 0
    flops_per_img = (3 + metric_fwd) * 8.2e9
    act_passes = 5 + 2 * metric_fwd
    t_mxu = batch * flops_per_img / V5E_BF16_PEAK
    step_bytes = (act_passes * ACT_BYTES_PER_IMG * batch  # fwd W+R, bwd W+R+reread
                  + 8 * PARAM_BYTES                       # adamw g/m/v/p passes
                  + INPUT_BYTES_PER_IMG * batch)
    t_hbm = step_bytes / V5E_HBM_BW
    return batch / max(t_mxu, t_hbm)


TARGET_IMG_S = 0.9 * roofline_img_s(128, "exact")


def _build(batch, acc_mode="exact", model_name="resnet50"):
    import jax

    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.data.mixup import build_mixup
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer

    size = int(os.environ.get("BENCH_SIZE", "224"))
    num_classes = 1000
    cfg = TrainConfig(
        model=model_name, input_size=size, batch_size=batch,
        mixup=0.8, smoothing=0.1, reprob=0.25, color_jitter=0.3,
        half_precision=True, train_acc_mode=acc_mode,
        remat=bool(int(os.environ.get("BENCH_REMAT", "0"))),
        flash_attn=bool(int(os.environ.get("BENCH_FLASH", "0"))),
    )
    from imageclassification_tpu.models import model_kwargs_for

    # same per-family routing train.py uses — the bench must measure the
    # exact model configuration training builds
    kwargs = model_kwargs_for(cfg, num_classes)
    kwargs.pop("pretrained", None)
    kwargs.pop("drop_rate", None)      # bench runs without dropout
    kwargs.pop("drop_path_rate", None)
    model = create_model(model_name, half_precision=True, **kwargs)
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
                # return the FULL metrics pytree: discarding all but the
                # loss lets XLA dead-code-eliminate the metric computations
                # — including the parity second forward in 'exact' mode
                # (~9.5 ms at batch 128) — which the real train loop pays
                # every step (engine/loop.py consumes every metric)
                return st, metrics
            # return the final carry too: a discarded carry defeats input
            # donation (XLA warns) and double-buffers every state leaf in
            # the loop (~1400 small copies/step in the device trace) — an
            # overhead the real host-dispatched train loop does not pay.
            # No donate: the tunneled relay backend rejects executables
            # whose outputs alias donated inputs; the once-per-dispatch
            # input->carry copy this costs is ~0.4 ms amortized over K
            # steps and cancels in the K_hi-K_lo difference anyway.
            return jax.lax.scan(body, state, None, length=K)
        return jax.jit(scanned)

    times = {}
    for K in (k_lo, k_hi):
        f = make(K)
        # chain the returned carry into the next call: the advancing
        # optimizer state defeats the relay's (executable, inputs)
        # memoization and mirrors how the real train loop feeds the step
        # (no donation here — see the note in make())
        st = fresh_state()
        st, metrics = f(st, data)
        np.asarray(metrics["loss"])  # compile + warm; FETCH to sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            # fetching the [K] losses is the only reliable sync on tunneled
            # relays (block_until_ready can return without a round trip);
            # the constant fetch RTT cancels in the K_hi-K_lo difference
            st, metrics = f(st, data)
            np.asarray(metrics["loss"])
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


def _probe_device(timeout_s: int = 600, attempts: int = 3) -> str | None:
    """Return None if the accelerator answers, else a reason string.

    The tunneled chip's claim can wedge indefinitely, and — measured in
    round 3 — KILLING a mid-claim client is precisely what wedges the
    relay-side grant for every later claimant. So the probe subprocess is
    never killed: it writes a marker file when the claim completes, the
    parent polls with a bounded budget, and on timeout the child is left
    to finish (or queue) harmlessly in the background while the parent
    falls back. Fast failures (exceptions, not hangs) are retried with
    backoff — those are the transient relay errors worth retrying."""
    import subprocess
    import sys
    import tempfile

    # the child writes marker+'.tmp' then os.rename()s it into place — the
    # parent can never read a half-written status (atomic on POSIX)
    code = (
        "import os, sys\n"
        "def put(msg):\n"
        "    open(sys.argv[1] + '.tmp', 'w').write(msg)\n"
        "    os.rename(sys.argv[1] + '.tmp', sys.argv[1])\n"
        "try:\n"
        "    import jax; jax.devices()\n"
        "    put('DEVICE_OK')\n"
        "except Exception as e:\n"
        "    put('ERROR: %r' % (e,))\n"
    )
    reason = "unknown"
    for attempt in range(attempts):
        marker = os.path.join(tempfile.mkdtemp(prefix="bench_probe_"), "status")
        with open("/dev/null", "w") as devnull:
            proc = subprocess.Popen(
                [sys.executable, "-c", code, marker],
                stdout=devnull, stderr=subprocess.STDOUT,
            )
        deadline = time.time() + timeout_s
        status = None
        while time.time() < deadline:
            if os.path.exists(marker):
                status = open(marker).read()
                break
            if proc.poll() is not None and not os.path.exists(marker):
                status = "ERROR: probe exited rc=%s without marker" % proc.returncode
                break
            time.sleep(2)
        if status is None:
            # hang: leave the child alive (killing it mid-claim wedges the
            # relay); further attempts would only queue behind it
            return (f"device claim did not complete within {timeout_s}s "
                    "(relay wedge?) — probe left running, not killed")
        if status.startswith("DEVICE_OK"):
            return None
        reason = status[:300]
        time.sleep(15 * (attempt + 1))  # transient error: backoff and retry
    return f"probe failed after {attempts} attempts — {reason}"


def _git_rev() -> str:
    try:
        import subprocess
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        return ""


def _stale_fallback(reason: str) -> None:
    """Emit the last committed chip-measured number with stale=true so the
    driver's perf series never has a hole (round-3's rc=2 made a full round
    of work invisible). The source of truth is benchmarks/bench_sweep.json,
    which is only ever written by a successful chip run of this file."""
    import sys

    out = {
        "metric": "resnet50_train_images_per_sec_per_chip",
        "value": None,
        "unit": "images/sec",
        "vs_baseline": None,
        "stale": True,
        "stale_reason": reason,
    }
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "bench_sweep.json")
    try:
        with open(sweep_path) as f:
            sweep = json.load(f)
        row = sweep["batch128_exact"]
        out["value"] = row["images_per_sec"]
        out["vs_baseline"] = round(row["images_per_sec"] / TARGET_IMG_S, 4)
        if "_meta" in sweep:  # when was the stale number actually measured?
            out["stale_source"] = sweep["_meta"]
    except Exception as e:
        out["stale_reason"] += f"; no committed sweep number either ({e!r})"
    print(f"bench.py: falling back to last committed chip number — {reason}",
          file=sys.stderr)
    print(json.dumps(out))


def _resilient_main() -> None:
    """Driver entry: bounded probe (+retries) → measurement in a bounded
    subprocess (retried once) → stale-number fallback. Never rc!=0 with an
    empty series; never an unbounded hang."""
    import subprocess
    import sys

    probe_budget = int(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))
    reason = _probe_device(timeout_s=probe_budget)
    if reason is not None:
        _stale_fallback(reason)
        return
    # The inner measurement is NEVER killed: it makes its own device claim
    # (a successful probe does not transfer its grant), and round-4 claims
    # took 6-55 min — killing a mid-claim client wedges the relay for every
    # later claimant (the exact failure _probe_device is designed around).
    # Same pattern as the probe: Popen + poll with a bounded budget; on
    # timeout the child is left running and we fall back to the stale
    # number. No retry after a timeout (a second claimant would only queue
    # behind the first); fast failures (rc!=0) are retried once.
    import tempfile

    inner_budget = int(os.environ.get("BENCH_INNER_TIMEOUT", "3600"))
    env = dict(os.environ, BENCH_INNER="1")
    for attempt in (1, 2):
        outpath = os.path.join(tempfile.mkdtemp(prefix="bench_inner_"), "out")
        with open(outpath, "w") as outf:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=outf, stderr=subprocess.STDOUT, text=True,
            )
        deadline = time.time() + inner_budget
        while time.time() < deadline and proc.poll() is None:
            time.sleep(5)
        if proc.poll() is None:
            # leave the child running — it may be mid-claim
            _stale_fallback(
                f"measurement exceeded {inner_budget}s — child left "
                "running (never killed mid-claim), no retry"
            )
            return
        out = open(outpath).read()
        line = next((ln for ln in reversed(out.splitlines())
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line is not None:
            # child stdout+stderr are merged in the capture file: keep the
            # driver-parsed stdout clean by routing non-JSON lines to stderr
            for ln in out.splitlines():
                print(ln, file=sys.stdout if ln.startswith("{") else sys.stderr)
            return
        reason = (f"measurement rc={proc.returncode} (attempt {attempt}): "
                  f"{out[-300:]}")
    _stale_fallback(reason)


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
                flops = (4 if acc_mode == "exact" else 3) * 8.2e9
                sweep[key] = {
                    "ms_per_step": round(per * 1e3, 2),
                    "images_per_sec": round(b / per, 1),
                }
                if int(os.environ.get("BENCH_SIZE", "224")) == 224:
                    # FLOP/byte constants are 224²-specific
                    sweep[key]["mfu"] = round(
                        b / per * flops / V5E_BF16_PEAK, 4
                    )
                    sweep[key]["vs_mode_roofline"] = round(
                        b / per / roofline_img_s(b, acc_mode), 4
                    )
                print(key, sweep[key], flush=True)
        # provenance for the stale-fallback path: how old the committed
        # number is, and which code revision measured it
        sweep["_meta"] = {
            "measured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
            "code_rev": _git_rev(),
            "device": str(jax.devices()[0].platform),
        }
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "bench_sweep.json")
        with open(out, "w") as f:
            json.dump(sweep, f, indent=2)

    if os.environ.get("BENCH_MODELS"):
        # per-family training throughput (img/s only — FLOPs differ per model)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "bench_models.json")
        rev = _git_rev()
        if os.environ.get("BENCH_FRESH") and os.path.exists(out):
            os.remove(out)  # drop rows for renamed/removed models
        flops_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "benchmarks", "model_flops.json")
        try:
            with open(flops_path) as f:
                model_flops = json.load(f)
        except Exception:
            model_flops = {}
        for name in os.environ["BENCH_MODELS"].split(","):
            name = name.strip()
            step_fn, fresh_state, data = _build(batch, model_name=name)
            per = time_scan(step_fn, fresh_state, data)
            row = {
                "batch": batch,
                "ms_per_step": round(per * 1e3, 2),
                "images_per_sec": round(batch / per, 1),
                # marks which code revision measured this row — a stale row
                # from a renamed/removed model is detectable (BENCH_FRESH=1
                # resets the file entirely)
                "code_rev": rev,
            }
            bench_size = int(os.environ.get("BENCH_SIZE", "224"))
            if (name in model_flops and bench_size == 224
                    and model_flops[name].get("input_size", 224) == 224):
                # XLA-cost-analysis fwd FLOPs (benchmarks/model_flops.py) x
                # 4 forwards-equivalent: fwd + dgrad + wgrad + the exact-mode
                # parity metric forward the default step runs. Guarded to
                # 224² like the sweep/headline MFU: model_flops.json's
                # per-image GFLOPs are 224²-specific, so a BENCH_SIZE
                # override must not record a silently wrong MFU into the
                # single source of truth for published per-family numbers.
                g = model_flops[name]["fwd_gflops_per_img"]
                row["train_mfu"] = round(
                    (batch / per) * 4 * g * 1e9 / V5E_BF16_PEAK, 4
                )
            print(name, row, flush=True)
            # merge-and-write per model so families can be re-benched
            # incrementally and a crash loses nothing — this file is the
            # SINGLE source of truth for every published per-family number
            # (BREAKDOWN.md + README tables are derived from it)
            merged = {}
            if os.path.exists(out):
                with open(out) as f:
                    merged = json.load(f)
            merged[name] = row
            with open(out, "w") as f:
                json.dump(merged, f, indent=2)

    step_fn, fresh_state, data = _build(batch)
    if mode == "dispatch":
        per = time_dispatch(step_fn, fresh_state, data)
    else:
        per = time_scan(step_fn, fresh_state, data)
    images_per_sec = batch / per
    # the roofline constants (FLOPs, activation bytes) describe ResNet-50 at
    # 224² — under BENCH_SIZE overrides the ratio would be silently wrong
    at_224 = int(os.environ.get("BENCH_SIZE", "224")) == 224
    print(json.dumps({
        "metric": "resnet50_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / TARGET_IMG_S, 4) if at_224
        else None,
    }))


if __name__ == "__main__":
    # plain `python bench.py` (the driver's invocation) goes through the
    # resilient wrapper: probe → bounded measurement subprocess → stale
    # fallback. BENCH_INNER is the wrapper's own child; sweep/model modes
    # are interactive instruments and run direct.
    if (os.environ.get("BENCH_INNER") or os.environ.get("BENCH_SWEEP")
            or os.environ.get("BENCH_MODELS")
            or os.environ.get("BENCH_DIRECT")):
        main()
    else:
        _resilient_main()
