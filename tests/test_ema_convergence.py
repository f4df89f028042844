"""EMA convergence semantics (round-5 forensics of the c5_rasampler_digits
EMA receipts; reference C8: timm ModelEmaV3 via train.py:198-201,
engine.py:67-77).

What round 4 recorded as a possible EMA bug (EMA top-1 14 pts under raw at
decay 0.99) is the textbook mean lag of a constant-decay EMA: the EMA tracks
the raw weights from ~1/(1-decay) real updates ago, so on a run whose
accuracy curve is still climbing, EMA accuracy trails raw by
(curve slope) x (lag). These tests lock the mechanism:

  * as decay shrinks, the EMA-vs-raw gap shrinks (test_gap_shrinks_with_decay)
    — a sign/plumbing bug would invert or break this monotonicity;
  * with --model_ema_warmup (timm ModelEmaV3 use_warmup semantics) the decay
    ramps as min(decay, (1+t)/(10+t)), so even a large decay tracks a short
    run closely (test_warmup_removes_init_contamination);
  * the effective decay fitted from consecutive train states matches the
    configured decay (test_effective_decay_matches_configured) — this is the
    same fit that confirmed decay 0.99 reached ema_update in the round-4 run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.engine.state import create_train_state
from imageclassification_tpu.engine.step import build_eval_step, build_train_step
from imageclassification_tpu.models import create_model
from imageclassification_tpu.optim.ema import warmup_decay
from imageclassification_tpu.optim.factory import create_optimizer

NUM_CLASSES = 3
SIZE = 16
BATCH = 24
STEPS = 30


def _class_batch(rng, n=BATCH):
    """Trivially separable data: class = dominant channel (+noise), so a
    converging run's accuracy curve rises steeply — the regime where EMA lag
    is visible."""
    labels = rng.integers(0, NUM_CLASSES, n)
    imgs = rng.integers(0, 60, (n, SIZE, SIZE, 3))
    for i, l in enumerate(labels):
        imgs[i, :, :, l] += 180
    return {
        "image": jnp.asarray(np.clip(imgs, 0, 255), jnp.uint8),
        "label": jnp.asarray(labels, jnp.int32),
    }


def _run(decay, warmup=False, steps=STEPS, seed=0):
    """Train resnet18 (has BN -> exercises ema_batch_stats too); return
    (raw_top1, ema_top1) on a held-out batch."""
    cfg = TrainConfig(
        model="resnet18", input_size=SIZE, batch_size=BATCH,
        model_ema=True, model_ema_decay=decay, model_ema_warmup=warmup,
        mixup=0.0, cutmix=0.0, smoothing=0.0, reprob=0.0, color_jitter=0.0,
        aa="", half_precision=False, lr=0.05,
    )
    model = create_model("resnet18", num_classes=NUM_CLASSES)
    tx = create_optimizer("sgd", cfg.lr, 0.0)
    state = create_train_state(
        model, tx, jax.random.key(seed), (1, SIZE, SIZE, 3), use_ema=True
    )
    lr_s = np.full(steps + 1, cfg.lr, np.float32)
    wd_s = np.zeros(steps + 1, np.float32)
    step = jax.jit(
        build_train_step(model, tx, cfg, NUM_CLASSES, None, lr_s, wd_s,
                         ema_decay=decay),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        state, _ = step(state, _class_batch(rng), jax.random.key(1))

    ev = jax.jit(build_eval_step(model, NUM_CLASSES))
    test = _class_batch(np.random.default_rng(seed + 999), n=96)

    def top1(params, stats):
        m = ev(params, stats, test)
        return float(m["top1_sum"]) / float(m["n"])

    return (top1(state.params, state.batch_stats),
            top1(state.ema_params, state.ema_batch_stats))


def test_gap_shrinks_with_decay():
    """On a converging run, EMA top-1 must approach raw top-1 as decay
    shrinks (the VERDICT r4 acceptance test). decay 0.5 has a mean lag of 2
    updates — indistinguishable from raw; decay 0.99 lags ~100 updates (more
    than this whole run) and may trail badly. A plumbing/sign bug would make
    the small-decay EMA diverge instead."""
    raw_small, ema_small = _run(decay=0.5)
    raw_big, ema_big = _run(decay=0.99)
    # identical data/seed => identical raw trajectory
    assert raw_small == pytest.approx(raw_big, abs=1e-6)
    assert raw_small > 0.8, f"training failed to converge (raw={raw_small})"
    gap_small = raw_small - ema_small
    gap_big = raw_big - ema_big
    assert gap_small <= 0.05, (
        f"EMA at decay 0.5 must match raw (raw={raw_small}, ema={ema_small})"
    )
    assert gap_small <= gap_big + 1e-6, (
        f"gap must shrink with decay: gap(0.5)={gap_small} > gap(0.99)={gap_big}"
    )


def test_warmup_removes_init_contamination():
    """--model_ema_warmup at decay 0.9995: effective decay is
    (1+t)/(10+t) << 0.9995 for a 30-update run, so the EMA tracks the run
    instead of the init weights."""
    raw_plain, ema_plain = _run(decay=0.9995, warmup=False)
    raw_warm, ema_warm = _run(decay=0.9995, warmup=True)
    assert raw_plain == pytest.approx(raw_warm, abs=1e-6)
    # without warmup, 0.9995^30 = 98.5% init weights -> EMA is ~the init model
    assert ema_warm >= ema_plain, (
        f"warmup must not hurt short-run EMA: {ema_warm} < {ema_plain}"
    )
    assert raw_warm - ema_warm <= 0.15, (
        f"warmup EMA must track a 30-update run (raw={raw_warm}, ema={ema_warm})"
    )


def test_warmup_decay_formula():
    assert float(warmup_decay(0.9995, 0)) == pytest.approx(0.1)
    assert float(warmup_decay(0.9995, 90)) == pytest.approx(0.91)
    assert float(warmup_decay(0.9995, 10_000_000)) == pytest.approx(0.9995)
    # small decays are unaffected once the ramp passes them
    assert float(warmup_decay(0.5, 100)) == pytest.approx(0.5)


def test_effective_decay_matches_configured():
    """Fit alpha from (ema_before, ema_after, params_after) over single
    updates: ema1 = d*ema0 + (1-d)*p1 exactly (no accumulation), so the
    least-squares alpha equals the configured decay. This is the forensic
    fit that verified --model_ema_decay plumbing on the round-4 checkpoints."""
    decay = 0.93
    cfg = TrainConfig(
        model="resnet18", input_size=SIZE, batch_size=BATCH,
        model_ema=True, model_ema_decay=decay,
        mixup=0.0, cutmix=0.0, smoothing=0.0, reprob=0.0, color_jitter=0.0,
        aa="", half_precision=False, lr=0.05,
    )
    model = create_model("resnet18", num_classes=NUM_CLASSES)
    tx = create_optimizer("sgd", cfg.lr, 0.0)
    state = create_train_state(
        model, tx, jax.random.key(0), (1, SIZE, SIZE, 3), use_ema=True
    )
    lr_s = np.full(8, cfg.lr, np.float32)
    step = jax.jit(
        build_train_step(model, tx, cfg, NUM_CLASSES, None, lr_s,
                         np.zeros(8, np.float32), ema_decay=decay),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    state, _ = step(state, _class_batch(rng), jax.random.key(1))  # warm
    e0 = jax.device_get(state.ema_params)
    state, _ = step(state, _class_batch(rng), jax.random.key(1))
    e1 = jax.device_get(state.ema_params)
    p1 = jax.device_get(state.params)
    num = den = 0.0
    for a, b, p in zip(jax.tree.leaves(e0), jax.tree.leaves(e1),
                       jax.tree.leaves(p1)):
        x = (np.asarray(a, np.float64) - np.asarray(p, np.float64)).ravel()
        y = (np.asarray(b, np.float64) - np.asarray(p, np.float64)).ravel()
        num += float(x @ y)
        den += float(x @ x)
    assert num / den == pytest.approx(decay, abs=1e-3)
