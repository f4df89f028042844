"""visualize.py — model visualization (reference README todo #4,
/root/reference/README.md:46): summary / Grad-CAM / feature maps.

The load-bearing property is probe identity: injecting the zero probe used
to differentiate an intermediate activation must not change the forward."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageclassification_tpu.models import create_model
from visualize import (
    make_gradcam_fn,
    module_call_order,
    overlay,
    pick_cam_layer,
)


def _ckpt(tmp_path, name, img=32, **kwargs):
    model = create_model(name, num_classes=3, half_precision=False, **kwargs)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, img, img, 3), jnp.float32), train=False,
    )
    ck = {
        "format_version": 1,
        "model_spec": {"name": name, "kwargs": kwargs},
        "num_classes": 3,
        "input_shape": [1, img, img, 3],
        "epoch": 0,
    }
    for col in variables:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables[col]
        )[0]:
            key = "/".join(
                str(getattr(p, a))
                for p in path for a in ("key", "idx", "name") if hasattr(p, a)
            )
            flat[key] = np.asarray(leaf)
        ck["model" if col == "params" else col] = flat
    path = str(tmp_path / f"{name}-ckpt.pth")
    with open(path, "wb") as f:
        pickle.dump(ck, f)
    return path


# expected auto-picked Grad-CAM layer per family: the last block with a
# spatial extent (ViT: the final encoder block's token sequence)
FAMILIES = [
    ("resnet18", "BasicBlock_7", 4),
    ("convnext_atto", "stage3_block1", 4),
    ("efficientvit_m0", "sub2_merge/ConvBN_0", 4),
    # pre-last-attention target: later layers have exactly-zero patch-token
    # gradients (classifier reads only the cls token)
    ("vit_tiny_patch16", "block11/LayerNorm_0", 3),
    ("mobilenet_v3_small", "bn_last", 4),
    ("densenet121", "norm5", 4),
]


@pytest.mark.parametrize("name,expect_layer,ndim", FAMILIES)
def test_auto_layer_and_gradcam(name, expect_layer, ndim):
    img = 64  # small enough for CPU, big enough that the last stage keeps a
    # >1x1 spatial extent (pick_cam_layer rejects 1x1 maps)
    model = create_model(name, num_classes=3, half_precision=False)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, img, img, 3), jnp.float32), train=False,
    )
    x0 = jnp.zeros((1, img, img, 3), jnp.float32)
    order = module_call_order(model, variables, x0)
    layer = pick_cam_layer(order)
    assert layer == expect_layer, (layer, [p for p, _ in order][-6:])
    shapes = dict(order)
    assert len(shapes[layer]) == ndim

    batch = 2
    act_shape = (batch,) + shapes[layer][1:]
    fn = make_gradcam_fn(model, layer, act_shape, img)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # the head kernel is zero-init — randomize it so gradients exist, and
    # assert the CAM is NOT the all-zero degenerate map (catches picking a
    # post-last-attention ViT layer, where patch-token grads vanish exactly)
    params = dict(params)
    params["head"] = dict(params["head"])
    params["head"]["kernel"] = jax.random.normal(
        jax.random.key(5), params["head"]["kernel"].shape,
        params["head"]["kernel"].dtype,
    ) * 0.1
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, img, img, 3), dtype=np.uint8)
    probs, cams = fn(params, batch_stats, jnp.asarray(images), jnp.int32(-1))
    probs, cams = np.asarray(probs), np.asarray(cams)

    assert cams.shape == (batch, img, img)
    assert np.isfinite(cams).all()
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6

    # the true anti-degeneracy invariant: the gradient of a logit wrt the
    # picked activation must be nonzero at NON-cls positions. Picking any
    # post-last-attention ViT layer fails this exactly (patch tokens feed
    # nothing the classifier reads); CAM ReLU-clipping noise does not.
    from visualize import _probe_apply

    v2 = dict(v := {"params": params})
    if batch_stats:
        v2["batch_stats"] = batch_stats
    # random (not zero) input: at x=0 every pre-ReLU activation in a
    # fresh BN-CNN is exactly 0 and relu'(0)=0 kills all gradients
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32)

    def logit0(probe):
        logits, _ = _probe_apply(model, v2, x, layer, probe)
        return logits[:, 0].sum()

    g = jax.grad(logit0)(jnp.zeros(act_shape, jnp.float32))
    g = np.asarray(g)
    spatial = g[:, 1:] if g.ndim == 3 else g  # 3D: drop the cls token
    assert np.abs(spatial).max() > 0.0, "zero gradient at patch positions"

    # probe identity: the gradcam pass's probabilities equal a plain forward
    from imageclassification_tpu.data.augment import eval_preprocess

    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    ref = jax.nn.softmax(
        model.apply(v, eval_preprocess(jnp.asarray(images)), train=False)
        .astype(jnp.float32), -1,
    )
    np.testing.assert_allclose(probs, np.asarray(ref), atol=1e-5)

    # explicit class_idx routes the gradient to that class
    probs2, cams2 = fn(params, batch_stats, jnp.asarray(images), jnp.int32(1))
    np.testing.assert_allclose(np.asarray(probs2), probs, atol=1e-5)
    assert np.isfinite(np.asarray(cams2)).all()


def test_overlay_and_colormap():
    img = np.zeros((8, 8, 3), np.uint8)
    cam = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    out = overlay(img, cam, alpha=0.5)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    assert out.max() > 0  # heatmap contributed


def test_gradcam_cli_end_to_end(tmp_path):
    from PIL import Image

    ckpt = _ckpt(tmp_path, "resnet18")
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        ).save(d / f"x{i}.jpg")

    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # strip the axon sitecustomize (PYTHONPATH) so the subprocess cannot
    # claim the real TPU — same hermeticity trick as test_multiprocess
    env.pop("PYTHONPATH", None)
    out_dir = tmp_path / "viz"
    r = subprocess.run(
        [sys.executable, "visualize.py", "--mode", "gradcam",
         "--model_weight_path", ckpt, "--img_path", str(d),
         "--img_size", "32", "--batch_size", "2",
         "--out_dir", str(out_dir)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = sorted(os.listdir(out_dir))
    assert len(pngs) == 3 and all(p.endswith(".png") for p in pngs)
    # at 32px the last two blocks are 1x1 maps, so the auto-pick lands on
    # the last block with spatial extent
    assert "Grad-CAM layer: BasicBlock_5" in r.stdout


def test_summary_cli(tmp_path):
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # strip the axon sitecustomize (PYTHONPATH) so the subprocess cannot
    # claim the real TPU — same hermeticity trick as test_multiprocess
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "visualize.py", "--mode", "summary",
         "--model", "resnet18", "--num_classes", "5", "--img_size", "32",
         "--model_weight_path", str(tmp_path / "missing.pth")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "number of params:" in r.stdout
    assert "GFLOPs" in r.stdout
