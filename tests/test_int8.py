"""int8 quantized inference path (reference C19 parity: the quantized model
RUNS int8 matmuls — torch.quantization.quantize_dynamic on nn.Linear,
/root/reference/modelchange.py:7-20)."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclassification_tpu.models import create_model
from imageclassification_tpu.ops.int8 import (
    int8_matmul,
    quantized_apply,
    split_executable_quant,
)


def test_int8_matmul_matches_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 64)), jnp.float32)
    w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    s = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)
    got = np.asarray(int8_matmul(x, jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b)))
    ref = np.asarray(x) @ w + b
    # int8 weight + dynamic int8 activation error is ~1% relative
    assert np.abs(got - ref).max() < 0.05 * max(1.0, np.abs(ref).max())


def _quantize_params_flat(flat):
    """Mimic dynamic_quantize_model's int8 branch on a flat param dict."""
    q, scales = {}, {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if k.endswith("kernel") and arr.ndim >= 2 and arr.size > 4096:
            mat = arr.reshape(-1, arr.shape[-1])
            s = np.abs(mat).max(axis=0) / 127.0
            s = np.where(s == 0, 1.0, s)
            q[k] = np.clip(np.round(mat / s), -127, 127).astype(np.int8).reshape(arr.shape)
            scales[k] = s.astype(np.float32)
        else:
            q[k] = arr
    return q, scales


def _flat(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, a))
            for p in path for a in ("key", "idx", "name") if hasattr(p, a)
        )
        out[key] = np.asarray(leaf)
    return out


def _unflat_like(template, flat):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            str(getattr(p, a))
            for p in path for a in ("key", "idx", "name") if hasattr(p, a)
        )
        leaves.append(flat.get(key, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("name", ["vit_tiny_patch16", "convnext_atto"])
def test_quantized_apply_close_to_fp32(name):
    """End-to-end int8 forward on Dense-heavy families: logits close to fp32,
    argmax agrees, and int8 kernels are genuinely consumed (no dequant)."""
    model = create_model(name, num_classes=10, half_precision=False)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (4, 64, 64, 3)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=False,
    )
    # zero-initialized heads (ViT) make the comparison vacuous — perturb
    # every param so all logits are non-trivial
    rng = np.random.default_rng(7)
    variables = dict(variables)
    variables["params"] = jax.tree.map(
        lambda p: p + jnp.asarray(rng.normal(0, 0.02, p.shape), p.dtype),
        variables["params"],
    )
    ref = np.asarray(model.apply(variables, x, train=False), np.float32)

    flat = _flat(variables["params"])
    qflat, scales = _quantize_params_flat(flat)
    # execution covers Dense (2D) and DenseGeneral (3D) kernels only
    exec_scales = {
        k: s for k, s in scales.items() if qflat[k].ndim in (2, 3)
    }
    assert exec_scales, f"{name} must have quantizable Dense kernels"
    # dequantize conv kernels like split_executable_quant does
    for k in scales:
        if k not in exec_scales:
            arr = qflat[k]
            qflat[k] = (
                arr.astype(np.float32).reshape(-1, arr.shape[-1]) * scales[k]
            ).reshape(arr.shape)
    qparams = _unflat_like(variables["params"], qflat)
    qvars = dict(variables)
    qvars["params"] = qparams

    got = np.asarray(
        quantized_apply(model, qvars, x, qscales=exec_scales, train=False),
        np.float32,
    )
    assert not np.allclose(got, ref, atol=1e-6), "int8 path must actually run"
    assert np.argmax(got, -1).tolist() == np.argmax(ref, -1).tolist()
    rel = np.abs(got - ref).max() / max(1.0, np.abs(ref).max())
    assert rel < 0.08, f"int8 drift too large: {rel}"


def test_split_executable_quant_keeps_dense_int8():
    ck = {
        "model": {
            "head/kernel": np.clip(
                np.random.default_rng(0).integers(-127, 128, (128, 64)), -127, 127
            ).astype(np.int8),
            "stem/conv/kernel": np.ones((3, 3, 16, 32), np.int8),
            "norm/scale": np.ones((128,), np.float32),
        },
        "quant_scales": {
            "head/kernel": np.full((64,), 0.01, np.float32),
            "stem/conv/kernel": np.full((32,), 0.02, np.float32),
        },
        "quant_dtype": "int8",
    }
    active = split_executable_quant(ck)
    assert set(active) == {"head/kernel"}
    assert ck["model"]["head/kernel"].dtype == np.int8        # stays quantized
    assert ck["model"]["stem/conv/kernel"].dtype == np.float32  # conv dequantized
    np.testing.assert_allclose(ck["model"]["stem/conv/kernel"], 0.02)
    assert "quant_scales" not in ck and "quant_dtype" not in ck


@pytest.fixture(scope="module")
def vit_ckpt(tmp_path_factory):
    """A handcrafted vit_tiny checkpoint (no training needed) — Dense-heavy,
    so the int8 execution path genuinely engages."""
    model = create_model("vit_tiny_patch16", num_classes=3, half_precision=False)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False,
    )
    ck = {
        "format_version": 1,
        "model_spec": {"name": "vit_tiny_patch16", "kwargs": {}},
        "model": _flat(variables["params"]),
        "num_classes": 3,
        "input_shape": [1, 32, 32, 3],
        "epoch": 0,
    }
    path = str(tmp_path_factory.mktemp("int8") / "checkpoint-0.pth")
    with open(path, "wb") as f:
        pickle.dump(ck, f)
    return path


def test_val_predict_runs_int8_without_dequantize(vit_ckpt):
    """val.py on an int8 checkpoint: Dense kernels stay int8 through the
    loaded params; predictions match the fp32 model closely."""
    from modelchange import dynamic_quantize_model
    from val import _predict_fn, initialize_model

    ckpt = vit_ckpt
    out = dynamic_quantize_model(ckpt, "int8")

    model, p0, bs0, _ = initialize_model(ckpt, model_ema=False)
    _, pq, bsq, ckq = initialize_model(out, model_ema=False, return_checkpoint=True)
    qscales = ckq["quant_exec_scales"]
    flatq = _flat(pq)
    for k in qscales:
        assert flatq[k].dtype == np.int8, f"{k} was dequantized on load"

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)), jnp.uint8
    )
    a = np.asarray(_predict_fn(model)(p0, bs0, x))
    b = np.asarray(_predict_fn(model, qscales)(pq, bsq, x))
    assert np.abs(a - b).max() < 0.07
    assert a.argmax(-1).tolist() == b.argmax(-1).tolist()


def test_stablehlo_export_of_quantized_ckpt(vit_ckpt):
    """The exported artifact of an int8 checkpoint embeds the quantized
    forward and round-trips numerically."""
    from modelchange import dynamic_quantize_model, load_stablehlo, pth2stablehlo
    from val import _predict_fn, initialize_model

    ckpt = vit_ckpt
    qck = dynamic_quantize_model(ckpt, "int8")
    out = pth2stablehlo(qck)
    exported = load_stablehlo(out)
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    model, pq, bsq, ckq = initialize_model(qck, model_ema=False, return_checkpoint=True)
    from imageclassification_tpu.ops.int8 import quantized_apply

    v = {"params": pq}
    if bsq:
        v["batch_stats"] = bsq
    ref = quantized_apply(model, v, x, qscales=ckq["quant_exec_scales"], train=False)
    np.testing.assert_allclose(
        np.asarray(exported.call(x), np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-3,
    )


def test_stablehlo_export_model_ema_fallback_stays_quantized(vit_ckpt):
    """--model_ema export of a quantized checkpoint WITHOUT EMA weights falls
    back to the raw (int8) weights — the export must still run the quantized
    forward, not bake unscaled int8 kernels into the artifact."""
    from modelchange import dynamic_quantize_model, load_stablehlo, pth2stablehlo
    from val import initialize_model

    qck = dynamic_quantize_model(vit_ckpt, "int8")
    out = pth2stablehlo(qck, model_ema=True)  # ckpt has no model_ema
    exported = load_stablehlo(out)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    got = np.asarray(exported.call(x), np.float32)

    # reference: fp32 model from the ORIGINAL checkpoint
    model, p0, bs0, _ = initialize_model(vit_ckpt, model_ema=False)
    v = {"params": p0}
    if bs0:
        v["batch_stats"] = bs0
    ref = np.asarray(model.apply(v, x, train=False), np.float32)
    # int8 drift is small; unscaled int8 weights would be off by ~100x
    assert np.abs(got - ref).max() < 0.1 * max(1.0, np.abs(ref).max())
