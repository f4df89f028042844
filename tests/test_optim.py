"""Optimizer factory tests (reference C9 name routing, optim_factory.py:50-122)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imageclassification_tpu.optim.ema import ema_update, init_ema
from imageclassification_tpu.optim.factory import (
    KNOWN_OPTIMIZERS,
    create_optimizer,
    set_hyperparams,
)


def _toy_params():
    return {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.ones((4,))},
    }


def _toy_grads(params):
    return jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)


@pytest.mark.parametrize("name", KNOWN_OPTIMIZERS)
def test_every_optimizer_steps(name):
    params = _toy_params()
    tx = create_optimizer(name, lr=1e-2, weight_decay=1e-4)
    state = tx.init(params)
    if name == "adahessian":  # consumes a Hutchinson diag as an extra arg
        hess = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        updates, state = tx.update(
            _toy_grads(params), state, params, hessian_diag=hess
        )
    else:
        updates, state = tx.update(_toy_grads(params), state, params)
    new_params = optax.apply_updates(params, updates)
    # params must change and stay finite
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree.leaves(diff)) > 0
    for leaf in jax.tree.leaves(new_params):
        assert bool(jnp.isfinite(leaf).all())


def test_lookahead_prefix():
    params = _toy_params()
    tx = create_optimizer("lookahead_adamw", lr=1e-2, weight_decay=1e-4)
    state = tx.init(params)
    for _ in range(7):  # crosses the sync_period=6 boundary
        updates, state = tx.update(_toy_grads(params), state, params)
        params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(params):
        assert bool(jnp.isfinite(leaf).all())


def test_invalid_optimizer_raises():
    with pytest.raises(ValueError):
        create_optimizer("notanopt", lr=1e-3, weight_decay=0.0)


def test_adahessian_full_train_step():
    """adahessian end-to-end: the train step computes the Hutchinson diagonal
    (jvp through grad) and the update stays finite and moves params."""
    import numpy as np

    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step
    from imageclassification_tpu.models import create_model

    cfg = TrainConfig(model="resnet18", input_size=32, batch_size=8,
                      opt="adahessian", smoothing=0.1, aa="", reprob=0.0,
                      color_jitter=0.0, half_precision=False)
    model = create_model("resnet18", num_classes=3)
    tx = create_optimizer("adahessian", lr=1e-3, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.key(0), (1, 32, 32, 3))
    lr = np.full(8, 1e-3, np.float32)
    wd = np.full(8, 1e-4, np.float32)
    step = jax.jit(build_train_step(model, tx, cfg, 3, None, lr, wd))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3)), jnp.uint8),
        "label": jnp.asarray(rng.integers(0, 3, (8,)), jnp.int32),
    }
    p0 = state.params
    state, metrics = step(state, batch, jax.random.key(1))
    assert bool(jnp.isfinite(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, state.params)
    assert max(jax.tree.leaves(moved)) > 0
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())


def test_injected_lr_schedule_changes_step_size():
    params = _toy_params()
    tx = create_optimizer("sgd", lr=1.0, weight_decay=0.0)
    state = tx.init(params)
    g = _toy_grads(params)

    state = set_hyperparams(state, 1.0, 0.0)
    up1, _ = tx.update(g, state, params)
    state = set_hyperparams(state, 0.5, 0.0)
    up2, _ = tx.update(g, state, params)
    r = up1["dense"]["kernel"] / up2["dense"]["kernel"]
    np.testing.assert_allclose(np.asarray(r), 2.0, rtol=1e-6)


def test_coupled_vs_decoupled_wd():
    # adamw with huge wd must shrink weights even with zero grads;
    # adam (coupled) with zero grads feeds wd through the adam normalizer.
    params = {"w": jnp.ones((4, 4))}
    zeros = {"w": jnp.zeros((4, 4))}
    tx = create_optimizer("adamw", lr=1e-1, weight_decay=1.0)
    state = tx.init(params)
    updates, _ = tx.update(zeros, state, params)
    assert float(updates["w"].mean()) < 0  # pure decay, pushes down


def test_ema_update_math():
    params = {"w": jnp.ones((3,))}
    ema = init_ema(params)
    new_params = {"w": jnp.full((3,), 2.0)}
    ema = ema_update(ema, new_params, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.1, rtol=1e-6)
    # gated update: do_update=False leaves EMA unchanged
    ema2 = ema_update(ema, new_params, decay=0.9, do_update=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(ema2["w"]), np.asarray(ema["w"]))


def test_inside_jit():
    params = _toy_params()
    tx = create_optimizer("adamw", lr=1e-3, weight_decay=1e-4)
    state = tx.init(params)

    @jax.jit
    def step(params, state, lr):
        state = set_hyperparams(state, lr, 1e-4)
        updates, state = tx.update(_toy_grads(params), state, params)
        return optax.apply_updates(params, updates), state

    p1, state = step(params, state, jnp.asarray(1e-3))
    p2, state = step(p1, state, jnp.asarray(1e-4))
    assert jnp.isfinite(p2["dense"]["kernel"]).all()


def test_set_hyperparams_through_lookahead():
    from imageclassification_tpu.optim.factory import set_hyperparams

    params = _toy_params()
    tx = create_optimizer("lookahead_sgd", lr=1.0, weight_decay=0.0)
    state = tx.init(params)
    state = set_hyperparams(state, 0.5, 0.0)
    up, _ = tx.update(_toy_grads(params), state, params)
    # nesterov sgd first step: update = -lr * (g + m*g) = -0.5 * 1.9 * 0.1
    np.testing.assert_allclose(np.asarray(up["dense"]["kernel"]), -0.095, rtol=1e-6)


def test_lookahead_adahessian_composes():
    """`lookahead_` must forward adahessian's hessian_diag extra arg to the
    wrapped transformation (was a TypeError at jit trace time)."""
    params = _toy_params()
    tx = create_optimizer("lookahead_adahessian", lr=1e-2, weight_decay=1e-4)
    state = tx.init(params)
    hess = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    for _ in range(2):
        updates, state = tx.update(
            _toy_grads(params), state, params, hessian_diag=hess
        )
        params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(params):
        assert bool(jnp.isfinite(leaf).all())
