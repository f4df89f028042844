"""Knowledge distillation and magnitude pruning (beyond-reference features —
the reference README's todo list items '量化/剪枝/蒸馏'; quantization is in
test_int8.py)."""

import json
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.data.mixup import build_mixup
from imageclassification_tpu.engine.state import create_train_state
from imageclassification_tpu.engine.step import build_train_step
from imageclassification_tpu.models import create_model
from imageclassification_tpu.optim.factory import create_optimizer


def _mk_state(model, lr=0.5, seed=0):
    tx = create_optimizer("sgd", lr, 0.0)
    return tx, create_train_state(
        model, tx, jax.random.key(seed), (1, 16, 16, 3)
    )


def _cfg(**kw):
    base = dict(
        model="resnet18", input_size=16, batch_size=4, mixup=0.0, cutmix=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, aa="",
        half_precision=False, lr=0.5,
    )
    base.update(kw)
    return TrainConfig(**base)


def _batch():
    return {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (4, 16, 16, 3)), jnp.uint8
        ),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }


def test_distillation_pulls_student_toward_teacher():
    """Pure-KD training (alpha=1) must reduce the student-teacher KL; the
    same steps WITHOUT distillation must not."""
    student = create_model("resnet18", num_classes=3)
    teacher_model = create_model("resnet18", num_classes=3)
    _, t_state = _mk_state(teacher_model, seed=42)
    # the classification head initializes to zeros — perturb the teacher so
    # its logits (and the KL target) are non-trivial
    rng = np.random.default_rng(3)
    t_state = t_state.replace(params=jax.tree.map(
        lambda p: p + jnp.asarray(rng.normal(0, 0.05, p.shape), p.dtype),
        t_state.params,
    ))
    teacher = (teacher_model, t_state.params, t_state.batch_stats)

    batch = _batch()
    lr_s = np.full(32, 0.05, np.float32)
    wd_s = np.zeros(32, np.float32)

    def kl_to_teacher(params, batch_stats):
        from imageclassification_tpu.data.augment import eval_preprocess

        x = eval_preprocess(batch["image"])
        sv = {"params": params, "batch_stats": batch_stats}
        tv = {"params": t_state.params, "batch_stats": t_state.batch_stats}
        # train-mode student forward (batch statistics): matches what the
        # distillation loss optimizes; running stats barely move in a few
        # steps so an eval-mode check would lag the trained params
        sl, _ = student.apply(sv, x, train=True,
                              rngs={"dropout": jax.random.key(0)},
                              mutable=["batch_stats"])
        s = jax.nn.log_softmax(sl)
        tl = teacher_model.apply(tv, x, train=False)
        t = jax.nn.softmax(tl)
        return float(jnp.mean(jnp.sum(t * (jnp.log(t + 1e-9) - s), -1)))

    # distilled run
    cfg = _cfg(distillation_alpha=1.0, distillation_tau=1.0,
               teacher_path="dummy", lr=0.05)
    tx, state = _mk_state(student, lr=0.05, seed=0)
    step = jax.jit(build_train_step(
        student, tx, cfg, 3, None, lr_s, wd_s, teacher=teacher,
    ))
    kl0 = kl_to_teacher(state.params, state.batch_stats)
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
    kl1 = kl_to_teacher(state.params, state.batch_stats)
    assert kl1 < kl0 * 0.9, (kl0, kl1)
    assert np.isfinite(float(m["loss"]))

    # control: plain CE run moves the student somewhere else
    tx2, state2 = _mk_state(student, lr=0.05, seed=0)
    step2 = jax.jit(build_train_step(
        student, tx2, _cfg(lr=0.05), 3, None, lr_s, wd_s,
    ))
    for i in range(8):
        state2, _ = step2(state2, batch, jax.random.key(i))
    kl_plain = kl_to_teacher(state2.params, state2.batch_stats)
    assert kl1 < kl_plain, (kl1, kl_plain)


def test_distillation_alpha_zero_is_identity():
    """alpha=0 (default) must produce bit-identical training with or without
    a teacher wired in."""
    model = create_model("resnet18", num_classes=3)
    teacher_model = create_model("resnet18", num_classes=3)
    _, t_state = _mk_state(teacher_model, seed=7)
    batch = _batch()
    lr_s = np.full(8, 0.5, np.float32)
    wd_s = np.zeros(8, np.float32)

    outs = []
    for teacher in (None, (teacher_model, t_state.params, t_state.batch_stats)):
        tx, state = _mk_state(model, seed=0)
        step = jax.jit(build_train_step(
            model, tx, _cfg(), 3, None, lr_s, wd_s, teacher=teacher,
        ))
        state, m = step(state, batch, jax.random.key(1))
        outs.append(float(m["loss"]))
    assert outs[0] == outs[1]


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    model = create_model("resnet18", num_classes=3, half_precision=False)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False,
    )
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        variables["params"]
    )[0]:
        key = "/".join(
            str(getattr(p, a))
            for p in path for a in ("key", "idx", "name") if hasattr(p, a)
        )
        flat[key] = np.asarray(leaf)
    ck = {
        "format_version": 1,
        "model_spec": {"name": "resnet18", "kwargs": {}},
        "model": flat,
        "optimizer": {"dummy": np.ones(3)},
        "step": 5,
        "num_classes": 3,
        "input_shape": [1, 32, 32, 3],
        "epoch": 0,
    }
    path = str(tmp_path_factory.mktemp("prune") / "checkpoint-0.pth")
    with open(path, "wb") as f:
        pickle.dump(ck, f)
    return path


@pytest.mark.parametrize("scope", ["global", "per_kernel"])
def test_prune_model(small_ckpt, scope):
    from modelchange import prune_model

    out = prune_model(small_ckpt, sparsity=0.5, scope=scope)
    with open(out, "rb") as f:
        ck = pickle.load(f)
    assert abs(ck["prune_sparsity"] - 0.5) < 0.02
    # per-kernel scope: every eligible kernel is ~50% sparse
    for k, v in ck["model"].items():
        if k.endswith("kernel") and v.ndim >= 2 and v.size > 4096:
            frac = float((v == 0).mean())
            if scope == "per_kernel":
                assert abs(frac - 0.5) < 0.02, (k, frac)
            else:
                assert frac > 0.0
    # stale optimizer moments dropped (they would undo the zeros on resume)
    assert "optimizer" not in ck and "step" not in ck

    # the pruned checkpoint loads through the normal transfer path
    from val import initialize_model

    model, params, batch_stats, nc = initialize_model(out, model_ema=False)
    assert nc == 3
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    y = model.apply(v, x, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_prune_rejects_bad_sparsity(small_ckpt):
    from modelchange import prune_model

    with pytest.raises(ValueError):
        prune_model(small_ckpt, sparsity=1.5)


def test_prune_mask_sparse_finetune(small_ckpt):
    """--prune_mask: the zero pattern of a pruned checkpoint must survive
    optimizer updates (including SGD momentum), while unmasked weights and
    the EMA keep training."""
    from modelchange import prune_model
    from val import initialize_model

    from imageclassification_tpu.checkpoint.io import derive_prune_masks
    from imageclassification_tpu.engine.state import create_train_state

    out = prune_model(small_ckpt, sparsity=0.5, scope="per_kernel")
    model, params, batch_stats, _ = initialize_model(
        out, model_ema=False, half_precision=False
    )
    masks, sparsity = derive_prune_masks(params)
    assert 0.3 < sparsity < 0.6, sparsity

    tx = create_optimizer("momentum", 0.1, 0.0)
    state = create_train_state(
        model, tx, jax.random.key(0), (1, 16, 16, 3), use_ema=True
    )
    state = state.replace(params=params)
    if batch_stats:
        state = state.replace(batch_stats=batch_stats)
    # train.py reseeds the EMA from the loaded weights (timm ModelEmaV3
    # copies AFTER pretrained load); mirror that here
    state = state.replace(ema_params=jax.tree.map(jnp.copy, state.params))

    lr_s = np.full(8, 0.1, np.float32)
    wd_s = np.zeros(8, np.float32)
    cfg = _cfg(lr=0.1, model_ema=True, prune_mask=True)
    step = jax.jit(build_train_step(
        model, tx, cfg, 3, None, lr_s, wd_s, prune_masks=masks,
    ))
    batch = _batch()
    for i in range(4):
        state, m = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(m["loss"]))

    def flat(tree):
        return {
            "/".join(
                str(getattr(p, a))
                for p in path for a in ("key", "idx", "name") if hasattr(p, a)
            ): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                jax.device_get(tree)
            )[0]
        }

    f0, f1, fe = flat(params), flat(state.params), flat(state.ema_params)
    moved = False
    for k, v0 in f0.items():
        v1 = f1[k]
        if k.endswith("kernel") and v0.ndim >= 2 and v0.size > 4096:
            zero = v0 == 0
            # masked entries stay exactly zero after 4 momentum updates,
            # in the live params AND the EMA shadow
            assert np.all(v1[zero] == 0), k
            assert np.all(fe[k][zero] == 0), k
            if np.any(v1[~zero] != v0[~zero]):
                moved = True
    assert moved  # unmasked weights actually trained


def test_prune_mask_without_masks_is_identity():
    """prune_masks=None (default) must leave the step byte-identical."""
    model = create_model("resnet18", num_classes=3)
    batch = _batch()
    lr_s = np.full(8, 0.5, np.float32)
    wd_s = np.zeros(8, np.float32)
    outs = []
    for masks in (None, jax.tree.map(lambda p: True, create_train_state(
            model, create_optimizer("sgd", 0.5, 0.0),
            jax.random.key(0), (1, 16, 16, 3)).params)):
        tx, state = _mk_state(model, seed=0)
        step = jax.jit(build_train_step(
            model, tx, _cfg(), 3, None, lr_s, wd_s, prune_masks=masks,
        ))
        state, m = step(state, batch, jax.random.key(1))
        outs.append(flatsum(state.params))
    assert outs[0] == outs[1]


def flatsum(tree):
    return float(sum(
        jnp.sum(jnp.abs(l.astype(jnp.float32)))
        for l in jax.tree_util.tree_leaves(tree)
    ))
