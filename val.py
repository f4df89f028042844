"""Inference CLI (reference C18: val.py) — folder triage and per-class
precision/recall from a saved checkpoint.

Parity notes:
  * `initialize_model` rebuilds the model from the checkpoint's stored
    model_spec — the user never names the architecture (reference loads the
    pickled nn.Module, val.py:14-28); with --model_ema true the EMA weights are
    used, falling back to raw weights when the checkpoint has no EMA
    (val.py:21-24).
  * `val_move` classifies every image in a folder and MOVES each file into a
    sibling `Empty/` (class 0) or `NonEmpty/` (other) directory — the
    reference's binary-triage workflow (val.py:39-60). Batched on device here
    (the reference runs one forward per image).
  * `val_precision` evaluates an ImageFolder tree and prints per-class
    precision/recall (val.py:63-89).
  * eval transform = squash resize (bilinear) + ImageNet normalize, no center
    crop (val.py:31-36).

The reference hardcodes its paths in __main__ (val.py:91-100); this CLI takes
the same values as flags with those defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from imageclassification_tpu.checkpoint.io import load_checkpoint, load_params_with_pruning
from imageclassification_tpu.data.folder import IMG_EXTENSIONS, scan_folder
from imageclassification_tpu.data.loader import decode_image
from imageclassification_tpu.data.augment import eval_preprocess
from imageclassification_tpu.models import create_model


def initialize_model(model_weight_path: str, model_ema: bool,
                     half_precision=True, return_checkpoint=False,
                     dequantize=False):
    """Rebuild (model, params, batch_stats, num_classes) from a checkpoint.
    With return_checkpoint=True the last element is the loaded checkpoint
    dict instead of num_classes (saves export callers a second unpickle).

    int8 checkpoints (modelchange.dynamic_quantize_model) keep their Dense
    kernels QUANTIZED — the forward then runs real int8 matmuls (reference
    quantize_dynamic parity, modelchange.py:7-20). The active scales are
    exposed as checkpoint['quant_exec_scales'] and honored by _predict_fn.
    dequantize=True restores fp32 kernels instead — for callers that need
    differentiable float weights (visualize.py Grad-CAM)."""
    from imageclassification_tpu.ops.int8 import split_executable_quant

    checkpoint = load_checkpoint(model_weight_path, dequantize=dequantize)
    qscales = {} if dequantize else split_executable_quant(checkpoint)
    checkpoint["quant_exec_scales"] = qscales
    num_classes = checkpoint["num_classes"]
    spec = checkpoint["model_spec"]
    kwargs = dict(spec.get("kwargs", {}))
    kwargs.pop("num_classes", None)
    model = create_model(
        spec["name"], num_classes=num_classes, half_precision=half_precision,
        **kwargs,
    )
    shape = checkpoint.get("input_shape") or [1, 224, 224, 3]
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros(shape, jnp.float32), train=False,
        )
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    if model_ema and "model_ema" in checkpoint:
        params, _ = load_params_with_pruning(
            template["params"], checkpoint["model_ema"], verbose=False
        )
        print("initialize model_ema success")
    else:
        params, _ = load_params_with_pruning(
            template["params"], checkpoint["model"], verbose=False
        )
    batch_stats = template.get("batch_stats", {})
    stats_src = checkpoint.get("batch_stats")
    if model_ema and checkpoint.get("model_ema_batch_stats"):
        stats_src = checkpoint["model_ema_batch_stats"]
    if batch_stats and stats_src:
        batch_stats, _ = load_params_with_pruning(
            batch_stats, stats_src, verbose=False
        )
    if return_checkpoint:
        return model, params, batch_stats, checkpoint
    return model, params, batch_stats, num_classes


def _predict_fn(model, qscales=None):
    from imageclassification_tpu.ops.int8 import quantized_apply

    @jax.jit
    def predict(params, batch_stats, images_u8):
        x = eval_preprocess(images_u8)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if qscales:
            logits = quantized_apply(
                model, variables, x, qscales=qscales, train=False
            ).astype(jnp.float32)
        else:
            logits = model.apply(variables, x, train=False).astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1)

    return predict


def _batched(paths, img_size, batch):
    for i in range(0, len(paths), batch):
        chunk = paths[i : i + batch]
        imgs = np.stack(
            [decode_image(p, img_size, train=False) for p in chunk]
        )
        pad = batch - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], np.uint8)])
        yield chunk, jnp.asarray(imgs)


def val_move(img_path, model_weight_path, img_size, model_ema, batch_size=64):
    """Move each image into Empty/ (pred class 0) or NonEmpty/ (else)."""
    # normpath: a trailing slash on --img_path must not nest Empty/NonEmpty
    # INSIDE the scanned folder
    base = os.path.dirname(os.path.normpath(img_path))
    empty_path = os.path.join(base, "Empty")
    non_empty_path = os.path.join(base, "NonEmpty")
    os.makedirs(empty_path, exist_ok=True)
    os.makedirs(non_empty_path, exist_ok=True)

    model, params, batch_stats, ck = initialize_model(
        model_weight_path, model_ema, return_checkpoint=True
    )
    predict = _predict_fn(model, ck.get("quant_exec_scales"))

    files = sorted(
        f for f in os.listdir(img_path)
        if f.lower().endswith(IMG_EXTENSIONS)
    )
    paths = [os.path.join(img_path, f) for f in files]
    for chunk, imgs in _batched(paths, img_size, batch_size):
        probs = np.asarray(predict(params, batch_stats, imgs))
        preds = probs.argmax(-1)[: len(chunk)]
        for p, cls in zip(chunk, preds):
            target = empty_path if cls == 0 else non_empty_path
            shutil.move(p, os.path.join(target, os.path.basename(p)))


def _training_class_map(model_weight_path):
    """{class_name: training_label} from the class_indices.json train.py
    writes next to its checkpoints, if present."""
    path = os.path.join(os.path.dirname(model_weight_path), "class_indices.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        inv = json.load(f)  # {"0": "cat", ...} (reference datasets.py:96-100)
    return {name: int(idx) for idx, name in inv.items()}


def val_precision(img_path, model_weight_path, img_size, model_ema, batch_size=64):
    """Per-class precision/recall over an ImageFolder tree.

    Labels come from the TRAINING class mapping (class_indices.json next to
    the checkpoint) when available — alphabetical order of the eval folder's
    subdirs silently mislabels everything if the eval tree is missing a
    class. Falls back to alphabetical (the reference's ImageFolder behavior)
    when no mapping is found."""
    index = scan_folder(img_path)
    model, params, batch_stats, ck = initialize_model(
        model_weight_path, model_ema, return_checkpoint=True
    )
    num_classes = ck["num_classes"]
    predict = _predict_fn(model, ck.get("quant_exec_scales"))

    remap = None
    train_map = _training_class_map(model_weight_path)
    if train_map is not None:
        missing = [c for c in index.class_to_idx if c not in train_map]
        if missing:
            print(f"classes not in training mapping, keeping folder order: {missing}")
        else:
            remap = {folder_id: train_map[name]
                     for name, folder_id in index.class_to_idx.items()}

    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)
    paths = [p for p, _ in index.samples]
    labels = np.asarray([l for _, l in index.samples])
    if remap is not None:
        labels = np.asarray([remap[l] for l in labels])
    pos = 0
    for chunk, imgs in _batched(paths, img_size, batch_size):
        probs = np.asarray(predict(params, batch_stats, imgs))
        preds = probs.argmax(-1)[: len(chunk)]
        targs = labels[pos : pos + len(chunk)]
        pos += len(chunk)
        for i in range(num_classes):
            tp[i] += np.sum((preds == i) & (targs == i))
            fp[i] += np.sum((preds == i) & (targs != i))
            fn[i] += np.sum((preds != i) & (targs == i))
    from imageclassification_tpu.utils.metrics import per_class_precision_recall

    precisions, recalls = per_class_precision_recall(tp, fp, fn)
    for i in range(num_classes):
        print(f"Precision{i}: {precisions[i]:.5f}, Recall{i}: {recalls[i]:.5f}")
    return tp, fp, fn


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Folder inference / validation")
    parser.add_argument("--img_path", default="", type=str)
    parser.add_argument(
        "--model_weight_path", default="train_cls/output/checkpoint-0.pth", type=str
    )
    parser.add_argument("--img_size", default=224, type=int)
    parser.add_argument("--model_ema", default=True, type=lambda v: v.lower() in ("1", "true", "t", "yes"))
    parser.add_argument("--mode", default="precision", choices=["precision", "move"])
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                        help="the reference hardcodes device in __main__ "
                             "(val.py:91-100); cpu also covers chipless hosts")
    a = parser.parse_args()
    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    print("Start calculation!")
    if a.mode == "move":
        val_move(a.img_path, a.model_weight_path, a.img_size, a.model_ema, a.batch_size)
    else:
        val_precision(a.img_path, a.model_weight_path, a.img_size, a.model_ema, a.batch_size)
