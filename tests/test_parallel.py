"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY §4 point 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from imageclassification_tpu.parallel.mesh import (
    batch_sharding,
    make_global_batch,
    make_mesh,
    param_sharding_rules,
    shard_params,
)


def test_make_mesh_default_all_devices():
    mesh = make_mesh("")
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == 8


def test_make_mesh_custom_shape():
    mesh = make_mesh("data:4,fsdp:2")
    assert mesh.axis_names == ("data", "fsdp")
    assert mesh.shape["data"] == 4 and mesh.shape["fsdp"] == 2
    with pytest.raises(ValueError):
        make_mesh("data:3")


def test_batch_sharded_over_data_axis():
    mesh = make_mesh("")
    batch = {
        "image": np.zeros((16, 8, 8, 3), np.uint8),
        "label": np.zeros((16,), np.int32),
    }
    g = make_global_batch(mesh, batch)
    assert g["image"].sharding.spec == P(("data",), None, None, None)
    # each device holds 2 rows
    shard_shapes = {s.data.shape for s in g["image"].addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_fsdp_shards_large_params_replicates_small():
    mesh = make_mesh("")
    params = {
        "big": jnp.zeros((1024, 64)),     # shardable on dim 0 (1024 % 8 == 0)
        "small": jnp.zeros((7,)),          # too small → replicated
        "odd": jnp.zeros((129, 257)),      # no dim divisible by 8 → replicated
    }
    rules = param_sharding_rules(mesh, params, fsdp=True)
    assert rules["big"].spec == P("data", None)
    assert rules["small"].spec == P()
    assert rules["odd"].spec == P()
    placed = shard_params(mesh, params, fsdp=True)
    assert placed["big"].addressable_shards[0].data.shape == (128, 64)


def test_dp_replicates_everything():
    mesh = make_mesh("")
    params = {"w": jnp.zeros((1024, 64))}
    placed = shard_params(mesh, params, fsdp=False)
    assert placed["w"].sharding.spec == P()


def test_gradient_allreduce_semantics():
    """Replicated params + sharded batch: XLA produces the GLOBAL-batch
    gradient (the DDP all-reduce equivalent, SURVEY §5.8)."""
    mesh = make_mesh("")
    w = jax.device_put(jnp.ones((4,)), jax.sharding.NamedSharding(mesh, P()))
    x = np.arange(32.0, dtype=np.float32).reshape(8, 4)
    xs = jax.device_put(
        jnp.asarray(x), jax.sharding.NamedSharding(mesh, P("data", None))
    )

    @jax.jit
    def grad_fn(w, xs):
        return jax.grad(lambda w: jnp.mean(xs @ w))(w)

    g = grad_fn(w, xs)
    np.testing.assert_allclose(np.asarray(g), x.mean(axis=0), rtol=1e-6)
    # gradient is fully replicated (each device has the same reduced value)
    assert g.sharding.is_fully_replicated


def test_full_train_step_on_2d_mesh_data_fsdp():
    """End-to-end train step on a 2-D 'data:4,fsdp:2' mesh: batch sharded over
    BOTH axes, params/optimizer sharded over the fsdp axis (ZeRO-3 layout the
    --mesh_shape flag exposes)."""
    from imageclassification_tpu.config import TrainConfig
    from imageclassification_tpu.engine.state import create_train_state
    from imageclassification_tpu.engine.step import build_train_step
    from imageclassification_tpu.models import create_model
    from imageclassification_tpu.optim.factory import create_optimizer

    mesh = make_mesh("data:4,fsdp:2")
    cfg = TrainConfig(model="resnet18", input_size=32, batch_size=16,
                      smoothing=0.1, mixup=0.2, fsdp=True,
                      half_precision=False)
    model = create_model("resnet18", num_classes=4)
    tx = create_optimizer("adamw", 1e-3, 0.05)
    state = create_train_state(model, tx, jax.random.key(0), (1, 32, 32, 3))
    state = shard_params(mesh, state, fsdp=True)

    # some large params actually live on the fsdp axis
    fsdp_sharded = [
        l for l in jax.tree.leaves(state.params)
        if isinstance(l, jax.Array)
        and any("fsdp" in str(s) for s in [l.sharding.spec])
    ]
    assert fsdp_sharded, "expected fsdp-axis-sharded parameters"

    from imageclassification_tpu.data.mixup import build_mixup
    mix = build_mixup(cfg, 4)
    lr = np.full(8, 1e-3, np.float32)
    wd = np.full(8, 5e-4, np.float32)
    step = jax.jit(build_train_step(model, tx, cfg, 4, mix, lr, wd),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    host = {
        "image": rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8),
        "label": rng.integers(0, 4, (16,)).astype(np.int32),
    }
    batch = make_global_batch(mesh, host)
    # batch is sharded over all 8 devices (both axes act as data for inputs)
    assert len(batch["image"].sharding.device_set) == 8

    state, metrics = step(state, batch, jax.random.key(1))
    assert bool(jnp.isfinite(metrics["loss"]))
    state, metrics = step(state, batch, jax.random.key(2))
    assert bool(jnp.isfinite(metrics["grad_norm"]))
