"""Layer-wise LR decay scales (reference D3 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from imageclassification_tpu.models import create_model
from imageclassification_tpu.optim.layer_decay import layer_decay_scales


def _shapes(model, size=32):
    return jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, size, size, 3)), train=False,
        )
    )["params"]


def test_convnext_scales_monotone():
    model = create_model("convnext_atto", num_classes=3)
    params = _shapes(model)
    scales = layer_decay_scales(params, "convnext_atto", 0.7)
    flat = {"/".join(str(getattr(p, "key", p)) for p in path): float(v)
            for (path, v) in jax.tree_util.tree_flatten_with_path(scales)[0]}
    stem = next(v for k, v in flat.items() if k.startswith("stem"))
    head = next(v for k, v in flat.items() if k.startswith("head/"))
    s0 = next(v for k, v in flat.items() if k.startswith("stage0_block0"))
    s3 = next(v for k, v in flat.items() if k.startswith("stage3_block0"))
    assert stem < s0 < s3 <= head
    assert abs(head - 1.0) < 1e-6  # head gets full LR


def test_vit_scales_per_block():
    model = create_model("vit_tiny_patch16", num_classes=3)
    params = _shapes(model)
    scales = layer_decay_scales(params, "vit_tiny_patch16", 0.8)
    flat = {"/".join(str(getattr(p, "key", p)) for p in path): float(v)
            for (path, v) in jax.tree_util.tree_flatten_with_path(scales)[0]}
    b0 = next(v for k, v in flat.items() if k.startswith("block0/"))
    b11 = next(v for k, v in flat.items() if k.startswith("block11/"))
    embed = next(v for k, v in flat.items() if k.startswith("patch_embed"))
    head = next(v for k, v in flat.items() if k.startswith("head/"))
    assert embed < b0 < b11 < head + 1e-9
    np.testing.assert_allclose(b11 / b0, (1 / 0.8) ** 11, rtol=1e-5)


def test_optimizer_applies_scales():
    import optax
    from imageclassification_tpu.optim.factory import create_optimizer

    params = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
    scales = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.5)}
    tx = create_optimizer("sgd", 1.0, 0.0, layer_scales=scales)
    state = tx.init(params)
    g = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
    updates, _ = tx.update(g, state, params)
    ratio = float(updates["a"][0] / updates["b"][0])
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-6)
