"""val.py and modelchange.py flows against a real trained checkpoint
(reference C18/C19 behaviors)."""

import os
import pickle
import shutil

import numpy as np
import pytest

from imageclassification_tpu.config import TrainConfig


@pytest.fixture(scope="module")
def trained_ckpt(toy_dataset, tmp_path_factory):
    """Train 1 epoch with EMA and return (output_dir, ckpt_path)."""
    import train as train_cli

    tmp = tmp_path_factory.mktemp("valrun")
    cfg = TrainConfig(
        data_path=toy_dataset, train_split_rato=0.5,
        output_dir=str(tmp / "output"), log_dir=str(tmp / "log"),
        model="resnet18", pretrained=False, batch_size=8, epochs=1,
        warmup_epochs=0, input_size=32, num_workers=2, mixup=0.0, cutmix=0.0,
        smoothing=0.0, reprob=0.0, color_jitter=0.0, model_ema=True,
        device="cpu", half_precision=False,
    )
    train_cli.main(cfg)
    return str(tmp / "output"), str(tmp / "output" / "checkpoint-0.pth")


def test_initialize_model_raw_and_ema(trained_ckpt):
    from val import initialize_model

    _, ckpt = trained_ckpt
    model, params, batch_stats, nc = initialize_model(ckpt, model_ema=False)
    assert nc == 3
    model2, ema_params, _, _ = initialize_model(ckpt, model_ema=True)
    # EMA after 2 steps differs from raw params
    import jax

    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params, ema_params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_val_precision_prints(trained_ckpt, toy_dataset, capsys):
    from val import val_precision

    _, ckpt = trained_ckpt
    tp, fp, fn = val_precision(toy_dataset, ckpt, 32, model_ema=False, batch_size=16)
    out = capsys.readouterr().out
    assert "Precision0:" in out and "Recall2:" in out
    assert tp.sum() + fp.sum() > 0
    # every sample accounted for exactly once: tp+fp == #samples
    assert int(tp.sum() + fp.sum()) == 30


def test_val_move_binary_triage(trained_ckpt, toy_dataset, tmp_path):
    from val import val_move

    _, ckpt = trained_ckpt
    src = tmp_path / "incoming"
    src.mkdir()
    n = 0
    for cls_dir in os.listdir(toy_dataset):
        for f in os.listdir(os.path.join(toy_dataset, cls_dir))[:3]:
            shutil.copy(os.path.join(toy_dataset, cls_dir, f), src / f"{cls_dir}_{f}")
            n += 1
    val_move(str(src), ckpt, 32, model_ema=False, batch_size=8)
    moved = len(list((tmp_path / "Empty").glob("*"))) + len(
        list((tmp_path / "NonEmpty").glob("*"))
    )
    assert moved == n
    assert len(list(src.glob("*"))) == 0  # all files moved out


def test_convert_ema_to_model(trained_ckpt):
    from modelchange import convert_model_ema_to_model

    _, ckpt = trained_ckpt
    out = convert_model_ema_to_model(ckpt)
    with open(out, "rb") as f:
        ck = pickle.load(f)
    assert "model_ema" not in ck and "optimizer" not in ck
    assert "model" in ck


def test_dynamic_quantize_int8(trained_ckpt):
    from modelchange import dynamic_quantize_model
    from val import initialize_model

    _, ckpt = trained_ckpt
    out = dynamic_quantize_model(ckpt, "int8")
    with open(out, "rb") as f:
        ck = pickle.load(f)
    assert ck["quant_dtype"] == "int8"
    assert len(ck["quant_scales"]) > 0
    # quantized kernels are int8
    some_q = next(iter(ck["quant_scales"]))
    assert ck["model"][some_q].dtype == np.int8


def test_pth2stablehlo_roundtrip(trained_ckpt):
    from modelchange import load_stablehlo, pth2stablehlo
    from val import initialize_model, _predict_fn
    import jax.numpy as jnp

    _, ckpt = trained_ckpt
    out = pth2stablehlo(ckpt)
    assert os.path.exists(out)
    exported = load_stablehlo(out)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    y = exported.call(x)
    assert np.asarray(y).shape == (1, 3)
    # numerically matches the live model
    model, params, batch_stats, _ = initialize_model(ckpt, model_ema=False)
    import jax

    def fwd(p, bs, xx):
        v = {"params": p}
        if bs:
            v["batch_stats"] = bs
        return model.apply(v, xx, train=False)

    ref = fwd(params, batch_stats, x)
    # AOT-compiled artifact vs live jit differ by fusion order — allow small drift
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), rtol=1e-2, atol=1e-3
    )


def test_quantized_checkpoint_dequantizes_on_load(trained_ckpt):
    """int8 checkpoints must be DEQUANTIZED by the loaders (raw -127..127
    kernels would silently produce garbage predictions)."""
    from modelchange import dynamic_quantize_model
    from val import initialize_model, _predict_fn
    import jax.numpy as jnp

    _, ckpt = trained_ckpt
    out = dynamic_quantize_model(ckpt, "int8")
    model, p0, bs0, _ = initialize_model(ckpt, model_ema=False)
    _, pq, bsq, _ = initialize_model(out, model_ema=False)
    predict = _predict_fn(model)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)), jnp.uint8
    )
    a = np.asarray(predict(p0, bs0, x))
    b = np.asarray(predict(pq, bsq, x))
    np.testing.assert_allclose(a, b, atol=0.05)  # int8 weight-only error


def test_derive_out_never_overwrites_input(tmp_path):
    from modelchange import _derive_out

    assert _derive_out("ck.pth", "-ema.pth") == "ck-ema.pth"
    # extensionless input (user-renamed checkpoint) must NOT map to itself
    assert _derive_out("checkpoint-best", "-ema.pth") == "checkpoint-best-ema.pth"
    assert _derive_out("a.ckpt", ".stablehlo") == "a.ckpt.stablehlo"


def test_val_precision_uses_training_class_mapping(
    trained_ckpt, toy_dataset, tmp_path
):
    """Eval tree missing the alphabetically-first class: labels must come
    from the training class_indices.json, not the folder's own order."""
    from val import val_precision

    _, ckpt = trained_ckpt
    classes = sorted(os.listdir(toy_dataset))
    sub = tmp_path / "subset"
    sub.mkdir()
    for cls in classes[1:]:  # drop class 0 ('cat')
        shutil.copytree(os.path.join(toy_dataset, cls), sub / cls)
    tp, fp, fn = val_precision(str(sub), ckpt, 32, model_ema=False,
                               batch_size=8)
    # no sample carries training label 0 — without the mapping, the first
    # remaining folder would have been labeled 0 and these would be nonzero
    assert tp[0] == 0 and fn[0] == 0
    n_eval = sum(len(os.listdir(sub / c)) for c in classes[1:])
    assert (tp[1:] + fn[1:]).sum() == n_eval  # every sample labeled 1 or 2


def test_val_move_trailing_slash(trained_ckpt, toy_dataset, tmp_path):
    """A trailing slash on --img_path must not nest Empty/NonEmpty inside
    the scanned folder."""
    from val import val_move

    _, ckpt = trained_ckpt
    src = tmp_path / "incoming2"
    src.mkdir()
    cls = sorted(os.listdir(toy_dataset))[0]
    for f in os.listdir(os.path.join(toy_dataset, cls))[:2]:
        shutil.copy(os.path.join(toy_dataset, cls, f), src / f)
    val_move(str(src) + "/", ckpt, 32, model_ema=False, batch_size=4)
    assert not (src / "Empty").exists() and not (src / "NonEmpty").exists()
    moved = len(list((tmp_path / "Empty").glob("*"))) + len(
        list((tmp_path / "NonEmpty").glob("*"))
    )
    assert moved == 2


def test_quantized_checkpoint_resave_reload_not_corrupted(trained_ckpt, tmp_path):
    """A quantized checkpoint that is loaded (dequantized) and re-pickled by a
    tool must NOT carry stale quant_scales: re-applying them on the next load
    would corrupt the weights (round-2 advisor finding)."""
    import pickle

    from imageclassification_tpu.checkpoint.io import load_checkpoint
    from modelchange import dynamic_quantize_model

    _, ckpt = trained_ckpt
    out = dynamic_quantize_model(ckpt, "int8")

    first = load_checkpoint(out)        # dequantized fp32
    assert "quant_scales" not in first and "quant_dtype" not in first

    resaved = str(tmp_path / "resaved.pth")
    with open(resaved, "wb") as f:
        pickle.dump(first, f)
    second = load_checkpoint(resaved)   # must NOT re-apply scales

    k = next(k for k, v in second["model"].items() if v.ndim >= 2)
    np.testing.assert_allclose(second["model"][k], first["model"][k])


def test_parity_harness_dry_run(tmp_path):
    """The two-framework diff harness constructs both commands and degrades
    gracefully when the reference's torch/timm env is absent."""
    import json as _json
    import subprocess as sp
    import sys as _sys

    out = tmp_path / "report.json"
    r = sp.run(
        [_sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "benchmarks", "parity_vs_reference.py"),
         "--dry_run", "--workdir", str(tmp_path / "runs"), "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rep = _json.loads(out.read_text())
    assert "train.py" in rep["ours"]["cmd"]
    assert "--seed 88" in rep["recipe"]
    assert rep["within_tolerance"] is None  # no runs executed in dry mode
