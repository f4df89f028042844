"""Engine-step semantics (reference engine.py behaviors SURVEY flags as
load-bearing: update_freq cadence, EMA only on real steps, non-finite skip,
schedule gathers, per-class counts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.data.mixup import build_mixup
from imageclassification_tpu.engine.state import create_train_state
from imageclassification_tpu.engine.step import (
    _per_class_counts,
    build_eval_step,
    build_train_step,
)
from imageclassification_tpu.models import create_model
from imageclassification_tpu.optim.factory import create_optimizer


def _setup(update_freq=1, model_ema=False, mixup=0.0, num_classes=3, lr=0.1):
    cfg = TrainConfig(
        model="resnet18", input_size=16, batch_size=4, update_freq=update_freq,
        model_ema=model_ema, mixup=mixup, cutmix=0.0, smoothing=0.0,
        reprob=0.0, color_jitter=0.0, aa="", half_precision=False, lr=lr,
    )
    model = create_model("resnet18", num_classes=num_classes)
    tx = create_optimizer("sgd", lr, 0.0)
    state = create_train_state(
        model, tx, jax.random.key(0), (1, 16, 16, 3),
        use_ema=model_ema, update_freq=update_freq,
    )
    mix = build_mixup(cfg, num_classes)
    lr_s = np.full(64, lr, np.float32)
    wd_s = np.zeros(64, np.float32)
    step = jax.jit(
        build_train_step(model, tx, cfg, num_classes, mix, lr_s, wd_s),
        donate_argnums=(0,),
    )
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (4, 16, 16, 3)), jnp.uint8
        ),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    return state, step, batch


def _params_equal(a, b):
    return all(
        bool(jnp.all(x == y)) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_per_class_counts():
    preds = jnp.array([0, 0, 1, 2])
    labels = jnp.array([0, 1, 1, 0])
    tp, fp, fn = _per_class_counts(preds, labels, 3)
    np.testing.assert_array_equal(np.asarray(tp), [1, 1, 0])
    np.testing.assert_array_equal(np.asarray(fp), [1, 0, 1])
    np.testing.assert_array_equal(np.asarray(fn), [1, 1, 0])


def test_update_freq_accumulation_cadence():
    """With update_freq=2, params change only on every second micro-step
    (reference engine.py:63-77)."""
    state, step, batch = _setup(update_freq=2)
    p0 = jax.device_get(state.params)
    state, m = step(state, batch, jax.random.key(1))
    p1 = jax.device_get(state.params)
    assert _params_equal(p0, p1), "params must not move on micro-step 1"
    state, m = step(state, batch, jax.random.key(1))
    p2 = jax.device_get(state.params)
    assert not _params_equal(p1, p2), "params must move on the boundary step"
    # accum buffer resets after the boundary
    assert float(max(jnp.abs(l).max() for l in jax.tree.leaves(state.grad_accum))) == 0.0


def test_ema_updates_only_on_real_steps():
    state, step, batch = _setup(update_freq=2, model_ema=True)
    e0 = jax.device_get(state.ema_params)
    state, _ = step(state, batch, jax.random.key(1))
    e1 = jax.device_get(state.ema_params)
    assert _params_equal(e0, e1), "EMA must not advance mid-accumulation"
    state, _ = step(state, batch, jax.random.key(1))
    e2 = jax.device_get(state.ema_params)
    assert not _params_equal(e1, e2), "EMA advances with the optimizer step"


def test_nonfinite_loss_skips_update():
    """A non-finite loss zeroes the step (reference engine.py:56-59)."""
    state, step, batch = _setup()
    p0 = jax.device_get(state.params)
    bad = dict(batch)
    bad["image"] = jnp.full_like(batch["image"], 255)
    # poison the params to force a nan loss
    poisoned = state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, state.params)
    )
    poisoned, m = step(poisoned, bad, jax.random.key(1))
    assert float(m["skipped"]) == 1.0
    # grad_norm of a skipped step is 0 (grads zeroed)
    assert float(m["grad_norm"]) == 0.0


def test_schedule_values_reported():
    state, step, batch = _setup(lr=0.25)
    state, m = step(state, batch, jax.random.key(1))
    assert abs(float(m["lr"]) - 0.25) < 1e-6
    assert float(m["weight_decay"]) == 0.0


def test_mixup_second_forward_accuracy_uses_hard_labels():
    state, step, batch = _setup(mixup=1.0)
    state, m = step(state, batch, jax.random.key(1))
    # class_acc computed against original int labels → in [0,1]
    assert 0.0 <= float(m["class_acc"]) <= 1.0
    assert np.asarray(m["tp"]).sum() + np.asarray(m["fn"]).sum() == 4  # one per sample


def test_eval_step_masks_padding():
    model = create_model("resnet18", num_classes=3)
    tx = create_optimizer("sgd", 0.1, 0.0)
    state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
    eval_step = jax.jit(build_eval_step(model, 3))
    batch = {
        "image": jnp.zeros((4, 16, 16, 3), jnp.uint8),
        "label": jnp.asarray([0, 1, -1, -1], jnp.int32),
    }
    out = eval_step(state.params, state.batch_stats, batch)
    assert float(out["n"]) == 2.0
    assert float(out["tp"].sum() + out["fp"].sum()) == 2.0
    assert float(out["top1_sum"]) <= 2.0


def test_train_acc_mode_mixed_skips_second_forward():
    """'mixed' mode reads acc from the mixed logits — still bounded/finite."""
    import numpy as np
    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.data.mixup import build_mixup
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step

    cfg = TrainConfig(
        model="resnet18", input_size=16, batch_size=4, mixup=1.0,
        smoothing=0.1, reprob=0.0, color_jitter=0.0, aa="",
        half_precision=False, train_acc_mode="mixed",
    )
    model = create_model("resnet18", num_classes=3)
    tx = create_optimizer("sgd", 0.1, 0.0)
    state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
    mix = build_mixup(cfg, 3)
    lr_s = np.full(8, 0.1, np.float32)
    step = jax.jit(build_train_step(model, tx, cfg, 3, mix, lr_s, lr_s),
                   donate_argnums=(0,))
    batch = {
        "image": jnp.zeros((4, 16, 16, 3), jnp.uint8),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert 0.0 <= float(m["class_acc"]) <= 1.0


def test_ema_batch_stats_tracked():
    """timm ModelEmaV3 EMAs BN running statistics too — verify ema_batch_stats
    advances with the optimizer step and differs from live stats."""
    state, step, batch = _setup(model_ema=True)
    assert state.ema_batch_stats is not None
    s0 = jax.device_get(state.ema_batch_stats)
    state, _ = step(state, batch, jax.random.key(1))
    s1 = jax.device_get(state.ema_batch_stats)
    assert not _params_equal(s0, s1)


def test_remat_flag_matches_no_remat():
    """jax.checkpoint changes memory, not math: losses must match exactly."""
    import numpy as np
    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step

    lr_s = np.full(8, 0.1, np.float32)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (4, 16, 16, 3)), jnp.uint8
        ),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    losses = []
    for remat in (False, True):
        cfg = TrainConfig(model="resnet18", input_size=16, batch_size=4,
                          mixup=0.0, cutmix=0.0, smoothing=0.0, reprob=0.0,
                          color_jitter=0.0, aa="", half_precision=False,
                          remat=remat)
        model = create_model("resnet18", num_classes=3)
        tx = create_optimizer("sgd", 0.1, 0.0)
        state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
        step = jax.jit(build_train_step(model, tx, cfg, 3, None, lr_s, lr_s),
                       donate_argnums=(0,))
        state, m = step(state, batch, jax.random.key(1))
        state, m = step(state, batch, jax.random.key(1))
        losses.append(float(m["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_nonfinite_microstep_preserves_accumulated_window():
    """With update_freq>1, a non-finite microstep must contribute nothing but
    KEEP the window's earlier finite micro-grads (wiping the accumulator made
    the boundary update apply a partial, mis-scaled gradient); a non-finite
    BOUNDARY microstep must discard the window so the next starts clean."""
    import optax

    state, step, batch = _setup(update_freq=3)
    # micro 1 (finite): accumulator picks up g1/3
    state, m1 = step(state, batch, jax.random.key(1))
    assert float(m1["skipped"]) == 0.0
    good_params = jax.device_get(state.params)
    accum_after_1 = float(optax.global_norm(state.grad_accum))
    assert accum_after_1 > 0

    # micro 2 poisoned → nan loss → skipped; accumulator must be unchanged
    poisoned = state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, state.params)
    )
    state, m2 = step(poisoned, batch, jax.random.key(2))
    assert float(m2["skipped"]) == 1.0
    accum_after_2 = float(optax.global_norm(state.grad_accum))
    assert np.isfinite(accum_after_2)
    assert abs(accum_after_2 - accum_after_1) < 1e-6 * max(accum_after_1, 1)

    # micro 3 (boundary, finite, params restored): update applies the window
    state = state.replace(
        params=jax.tree.map(jnp.asarray, good_params)
    )
    state, m3 = step(state, batch, jax.random.key(3))
    assert float(m3["skipped"]) == 0.0
    assert not _params_equal(good_params, jax.device_get(state.params))
    assert float(optax.global_norm(state.grad_accum)) == 0.0  # window reset

    # a poisoned BOUNDARY microstep discards the window
    state, _ = step(state, batch, jax.random.key(4))       # micro 1 of window
    state, _ = step(state, batch, jax.random.key(5))       # micro 2
    before = jax.device_get(state.params)
    poisoned = state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, state.params)
    )
    state, mb = step(poisoned, batch, jax.random.key(6))   # boundary, nan
    assert float(mb["skipped"]) == 1.0
    state = state.replace(params=jax.tree.map(jnp.asarray, before))
    assert float(optax.global_norm(state.grad_accum)) == 0.0


def test_min_lr_reflects_layer_decay_scales():
    """Under --layer_decay the reported min_lr must be lr * min(scale), not a
    duplicate of lr (reference computes min/max over param groups,
    engine.py:101-117)."""
    from imageclassification_tpu.optim.layer_decay import layer_decay_scales

    cfg = TrainConfig(
        model="resnet18", input_size=16, batch_size=4, mixup=0.0, cutmix=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, aa="",
        half_precision=False, lr=0.1, layer_decay=0.7,
    )
    model = create_model("resnet18", num_classes=3)
    tx0 = create_optimizer("sgd", 0.1, 0.0)
    state = create_train_state(model, tx0, jax.random.key(0), (1, 16, 16, 3))
    scales = layer_decay_scales(state.params, "resnet18", 0.7)
    leaves = [float(s) for s in jax.tree.leaves(scales)]
    tx = create_optimizer("sgd", 0.1, 0.0, layer_scales=scales)
    state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
    lr_s = np.full(8, 0.1, np.float32)
    wd_s = np.zeros(8, np.float32)
    step = jax.jit(
        build_train_step(
            model, tx, cfg, 3, None, lr_s, wd_s,
            lr_scale_bounds=(min(leaves), max(leaves)),
        ),
        donate_argnums=(0,),
    )
    batch = {
        "image": jnp.zeros((4, 16, 16, 3), jnp.uint8),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert min(leaves) < 1.0  # layer decay actually spreads the scales
    assert abs(float(m["min_lr"]) - 0.1 * min(leaves)) < 1e-7
    assert abs(float(m["lr"]) - 0.1 * max(leaves)) < 1e-7
    assert float(m["min_lr"]) < float(m["lr"])


def test_inf_grad_norm():
    """--grad_norm_type inf reports max|g| (reference get_grad_norm_
    norm_type=inf, utils.py:456-468)."""
    from imageclassification_tpu.engine.step import _global_norm

    tree = {"a": jnp.asarray([1.0, -7.0]), "b": jnp.asarray([[3.0, 2.0]])}
    assert abs(float(_global_norm(tree, float("inf"))) - 7.0) < 1e-7
    l2 = float(np.sqrt(1 + 49 + 9 + 4))
    assert abs(float(_global_norm(tree, 2.0)) - l2) < 1e-5

    cfg = TrainConfig(
        model="resnet18", input_size=16, batch_size=4, mixup=0.0, cutmix=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, aa="",
        half_precision=False, lr=0.1, grad_norm_type=float("inf"),
    )
    model = create_model("resnet18", num_classes=3)
    tx = create_optimizer("sgd", 0.1, 0.0)
    state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
    lr_s = np.full(8, 0.1, np.float32)
    wd_s = np.zeros(8, np.float32)
    step = jax.jit(
        build_train_step(model, tx, cfg, 3, None, lr_s, wd_s),
        donate_argnums=(0,),
    )
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (4, 16, 16, 3)), jnp.uint8
        ),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["grad_norm"])) and float(m["grad_norm"]) > 0


def test_mixup_accuracy_forward_uses_post_update_params():
    """The exact-mode metric forward must see the stepped weights (reference
    runs it after optimizer.step()+EMA, engine.py:71-91). With a large LR the
    post-update logits differ measurably from pre-update ones — assert the
    reported accuracy matches a reference computation on the NEW params."""
    from imageclassification_tpu.data.augment import AugmentPipeline

    cfg = TrainConfig(
        model="resnet18", input_size=16, batch_size=4, mixup=1.0, cutmix=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, aa="",
        half_precision=False, lr=5.0,
    )
    model = create_model("resnet18", num_classes=3)
    tx = create_optimizer("sgd", 5.0, 0.0)
    state = create_train_state(model, tx, jax.random.key(0), (1, 16, 16, 3))
    mix = build_mixup(cfg, 3)
    lr_s = np.full(8, 5.0, np.float32)
    wd_s = np.zeros(8, np.float32)
    step = jax.jit(build_train_step(model, tx, cfg, 3, mix, lr_s, wd_s))
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (4, 16, 16, 3)), jnp.uint8
        ),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    rng = jax.random.key(1)
    new_state, m = step(state, batch, rng)

    # recompute the metric forward exactly as the step does, on NEW params
    step_rng = jax.random.fold_in(rng, 0)  # state.step == 0
    k_aug, k_mix, k_drop, k_drop2 = jax.random.split(step_rng, 4)
    images = AugmentPipeline(cfg)(batch["image"], k_aug)
    logits_new, _ = model.apply(
        {"params": new_state.params, "batch_stats": state.batch_stats},
        images, train=True, rngs={"dropout": k_drop2}, mutable=["batch_stats"],
    )
    acc_new = float(
        jnp.mean((jnp.argmax(logits_new, -1) == batch["label"]).astype(jnp.float32))
    )
    logits_old, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=True, rngs={"dropout": k_drop2}, mutable=["batch_stats"],
    )
    # post-update logits must actually differ from pre-update (lr=5 guarantees it)
    assert float(jnp.max(jnp.abs(logits_new - logits_old))) > 1e-3
    assert abs(float(m["class_acc"]) - acc_new) < 1e-6
