"""Model visualization CLI — closes the reference README's todo #4
("增加模型可视化", /root/reference/README.md:46) with a TPU-native
implementation. Three modes:

  * summary   — per-module parameter/shape table (flax nn.tabulate) plus
                XLA's own cost analysis of the compiled eval forward
                (FLOPs, HBM bytes accessed) — the numbers the compiler
                actually schedules, not an op-walker estimate.
  * gradcam   — Grad-CAM class-activation overlays. Model-agnostic: the
                target activation is read (and differentiated) through a
                zero "probe" injected with flax.linen.intercept_methods,
                so no model defines hooks; forward + activation + gradient
                happen in ONE jitted pass per batch. Works on 4D CNN
                features (resnet/convnext/efficientvit) and 3D ViT token
                sequences (cls token dropped, grid reshaped).
  * features  — per-stage feature-map energy heatmaps (channel-wise L2)
                for every spatial module output, as PNG grids.

Checkpoint loading, preprocessing and class mapping reuse the val.py path
(reference val.py:14-36), so any checkpoint this framework writes —
including EMA and int8-quantized ones — visualizes without extra flags.
"""

from __future__ import annotations

import argparse
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from imageclassification_tpu.data.folder import IMG_EXTENSIONS
from imageclassification_tpu.data.loader import decode_image
from imageclassification_tpu.data.augment import eval_preprocess
from val import initialize_model


# ---------------------------------------------------------------------------
# module discovery

def module_call_order(model, variables, x):
    """[(path_str, shape)] for every submodule __call__ in execution order.

    Runs one abstract (eval_shape) forward under an interceptor — no FLOPs
    are spent and no device is touched."""
    order = []

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if context.method_name == "__call__" and hasattr(out, "shape"):
            path = "/".join(str(p) for p in context.module.path)
            if path:  # skip the root module's own return
                order.append((path, tuple(out.shape)))
        return out

    def run(variables, x):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=False)

    jax.eval_shape(run, variables, x)
    return order


def _griddable(n):
    """Token count that maps to a square patch grid (with or without a
    leading cls token)."""
    for k in (n, n - 1):
        g = int(round(float(np.sqrt(k))))
        if g >= 2 and g * g == k:
            return True
    return False


_ATTN_RE = re.compile(r"(?i)attention|(^|/)attn(/|$)")


def pick_cam_layer(order):
    """Default Grad-CAM target: the LAST module in execution order whose
    output is a spatial map — 4D (B,H,W,C) with a square H=W>1 extent
    (CNN feature; squareness excludes attention internals like
    (B,N,heads,head_dim)), or a 3D (B,N,C) token sequence whose N forms a
    patch grid (ViT).

    ViT caveat: after the FINAL attention nothing mixes tokens, and the
    classifier reads only the cls token — so gradients at every patch token
    of a later layer are exactly zero and the CAM would be blank. For the
    3D case the pick is therefore the last token map BEFORE the last
    attention call (≈ blocks[-1].norm1, the standard ViT Grad-CAM target);
    4D CNN maps feed a global pool and don't have this problem."""
    last4 = last4_i = None
    cand3 = []
    attn_prefix = None
    for i, (path, shape) in enumerate(order):
        if len(shape) == 4 and shape[1] == shape[2] and shape[1] > 1:
            last4, last4_i = path, i
        elif len(shape) == 3 and _griddable(shape[1]):
            cand3.append((i, path))
        if _ATTN_RE.search(path):
            # path of the attention MODULE itself (cut after the segment
            # that matched, dropping any submodule tail like /query, /out)
            segs = path.split("/")
            k = max(j for j, s in enumerate(segs) if _ATTN_RE.search(s))
            attn_prefix = "/".join(segs[: k + 1])
    if attn_prefix is None:
        first_attn_i = len(order)
    else:
        # first call belonging to the LAST attention module: everything at
        # or after this index has zero gradient at patch tokens
        first_attn_i = min(
            i for i, (p, _) in enumerate(order)
            if p == attn_prefix or p.startswith(attn_prefix + "/")
        )
    pre_attn3 = [p for i, p in cand3 if i < first_attn_i]
    if last4 is not None and (not pre_attn3 or last4_i >= first_attn_i):
        return last4
    if pre_attn3:
        return pre_attn3[-1]
    if last4 is not None:
        return last4
    if cand3:
        return cand3[-1][1]
    raise ValueError("no spatial module output found to visualize")


def _probe_apply(model, variables, x, layer, probe):
    """Forward pass returning (logits, activation-at-layer), where the
    activation has `probe` added — d(logits)/d(probe) IS the gradient with
    respect to the activation."""
    act = []

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if (context.method_name == "__call__"
                and "/".join(str(p) for p in context.module.path) == layer):
            out = out + probe
            act.append(out)
        return out

    with nn.intercept_methods(interceptor):
        logits = model.apply(variables, x, train=False)
    if not act:
        raise ValueError(f"layer {layer!r} never executed")
    return logits, act[-1]


# ---------------------------------------------------------------------------
# grad-cam

def make_gradcam_fn(model, layer, act_shape, img_size):
    """One jitted pass: probs + per-image Grad-CAM map at input resolution.

    class_idx < 0 selects each image's argmax class."""

    @jax.jit
    def gradcam(params, batch_stats, images_u8, class_idx):
        x = eval_preprocess(images_u8)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def f(probe):
            logits, act = _probe_apply(model, variables, x, layer, probe)
            return logits, (logits, act)

        probe = jnp.zeros(act_shape, x.dtype)
        _, vjp, (logits, act) = jax.vjp(f, probe, has_aux=True)
        logits = logits.astype(jnp.float32)
        cls = jnp.where(class_idx >= 0, class_idx, logits.argmax(-1))
        cls = jnp.broadcast_to(cls, logits.shape[:1])
        (grad,) = vjp(jax.nn.one_hot(cls, logits.shape[-1], dtype=logits.dtype))
        act = act.astype(jnp.float32)
        grad = grad.astype(jnp.float32)

        if act.ndim == 3:  # ViT tokens: drop cls, reshape to the patch grid
            n = act.shape[1]
            g = int(round(float(np.sqrt(n - 1))))
            if g * g == n - 1:
                act, grad = act[:, 1:], grad[:, 1:]
            else:
                g = int(round(float(np.sqrt(n))))
            act = act.reshape(act.shape[0], g, g, act.shape[-1])
            grad = grad.reshape(grad.shape[0], g, g, grad.shape[-1])

        w = grad.mean(axis=(1, 2), keepdims=True)       # GAP of gradients
        cam = jax.nn.relu((w * act).sum(-1))            # (B, h, w)
        cam = jax.image.resize(
            cam, (cam.shape[0], img_size, img_size), "bilinear"
        )
        lo = cam.min(axis=(1, 2), keepdims=True)
        hi = cam.max(axis=(1, 2), keepdims=True)
        cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
        return jax.nn.softmax(logits, -1), cam

    return gradcam


def _jet(x):
    """Minimal jet-style colormap, x in [0,1] -> uint8 RGB (no mpl dep)."""
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def overlay(image_u8, cam, alpha=0.4):
    heat = _jet(np.asarray(cam, np.float32))
    return np.clip(
        (1 - alpha) * np.asarray(image_u8, np.float32) + alpha * heat, 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# modes

def _list_images(img_path):
    if os.path.isfile(img_path):
        return [img_path]
    return sorted(
        os.path.join(img_path, f) for f in os.listdir(img_path)
        if f.lower().endswith(IMG_EXTENSIONS)
    )


def run_gradcam(a):
    model, params, batch_stats, nc = initialize_model(
        a.model_weight_path, a.model_ema, half_precision=False,
        dequantize=True,
    )
    paths = _list_images(a.img_path)
    if not paths:
        raise SystemExit(f"no images under {a.img_path}")
    os.makedirs(a.out_dir, exist_ok=True)

    x0 = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
    order = module_call_order(model, _vars(params, batch_stats), x0)
    layer = a.layer or pick_cam_layer(order)
    shapes = dict(order)
    if layer not in shapes:
        known = [p for p, s in order if len(s) in (3, 4)]
        raise SystemExit(
            f"unknown --layer {layer!r}; spatial candidates: {known}"
        )
    print(f"Grad-CAM layer: {layer} {shapes[layer]}")

    batch = a.batch_size
    act_shape = (batch,) + shapes[layer][1:]
    fn = make_gradcam_fn(model, layer, act_shape, a.img_size)
    from PIL import Image

    for i in range(0, len(paths), batch):
        chunk = paths[i : i + batch]
        imgs = np.stack(
            [decode_image(p, a.img_size, train=False) for p in chunk]
        )
        pad = batch - len(chunk)
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], np.uint8)]
            )
        probs, cams = fn(params, batch_stats, jnp.asarray(imgs),
                         jnp.int32(a.class_idx))
        probs, cams = np.asarray(probs), np.asarray(cams)
        for j, p in enumerate(chunk):
            out = overlay(imgs[j], cams[j], a.alpha)
            cls = int(probs[j].argmax()) if a.class_idx < 0 else a.class_idx
            stem = os.path.splitext(os.path.basename(p))[0]
            dst = os.path.join(
                a.out_dir, f"{stem}_cam_cls{cls}_p{probs[j].max():.2f}.png"
            )
            Image.fromarray(out).save(dst)
            print(f"{p} -> {dst} (class {cls}, prob {probs[j].max():.4f})")


def run_features(a):
    model, params, batch_stats, _ = initialize_model(
        a.model_weight_path, a.model_ema, half_precision=False,
        dequantize=True,
    )
    paths = _list_images(a.img_path)[:1]
    if not paths:
        raise SystemExit(f"no images under {a.img_path}")
    os.makedirs(a.out_dir, exist_ok=True)
    img = decode_image(paths[0], a.img_size, train=False)
    x = jnp.asarray(img[None])

    acts = {}

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        path = "/".join(str(p) for p in context.module.path)
        if (context.method_name == "__call__" and hasattr(out, "ndim")
                and out.ndim == 4 and "/" not in path and out.shape[1] > 1):
            acts[path] = out  # top-level stages only
        return out

    @jax.jit
    def fwd(params, batch_stats, x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        with nn.intercept_methods(interceptor):
            model.apply(variables, eval_preprocess(x), train=False)
        return {k: jnp.linalg.norm(v.astype(jnp.float32), axis=-1)[0]
                for k, v in acts.items()}

    from PIL import Image

    maps = jax.device_get(fwd(params, batch_stats, x))
    stem = os.path.splitext(os.path.basename(paths[0]))[0]
    for name, m in maps.items():
        m = (m - m.min()) / max(m.max() - m.min(), 1e-8)
        big = np.asarray(Image.fromarray(_jet(m)).resize(
            (a.img_size, a.img_size), Image.NEAREST))
        dst = os.path.join(
            a.out_dir, f"{stem}_feat_{name.replace('/', '_')}.png"
        )
        Image.fromarray(big).save(dst)
        print(f"{name} {m.shape} -> {dst}")


def _vars(params, batch_stats):
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    return v


def run_summary(a):
    if a.model_weight_path and os.path.exists(a.model_weight_path):
        model, params, batch_stats, nc = initialize_model(
            a.model_weight_path, a.model_ema, half_precision=False
        )
        variables = _vars(params, batch_stats)
    else:
        from imageclassification_tpu.models import create_model

        model = create_model(
            a.model, num_classes=a.num_classes, half_precision=False
        )
        variables = None
    x = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)

    table = nn.tabulate(
        model, {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        depth=a.depth,
        console_kwargs={"width": 180, "force_terminal": False},
    )(x, train=False)
    print(table)

    if variables is None:
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            x, train=False,
        )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    compiled = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    ).lower(variables, x).compile()
    cost = compiled.cost_analysis() or {}
    flops = cost.get("flops", 0.0)
    byt = cost.get("bytes accessed", 0.0)
    print(f"number of params: {n_params}")
    print(f"XLA cost analysis (batch 1, {a.img_size}x{a.img_size} eval "
          f"forward): {flops / 1e9:.3f} GFLOPs, "
          f"{byt / 1e6:.1f} MB HBM accessed")


if __name__ == "__main__":
    p = argparse.ArgumentParser("Model visualization")
    p.add_argument("--mode", default="gradcam",
                   choices=["summary", "gradcam", "features"])
    p.add_argument("--model_weight_path",
                   default="train_cls/output/checkpoint-best.pth")
    p.add_argument("--model", default="efficientvit_m0",
                   help="summary-mode fallback when no checkpoint exists")
    p.add_argument("--num_classes", default=1000, type=int)
    p.add_argument("--img_path", default="", type=str,
                   help="image file or folder (gradcam/features)")
    p.add_argument("--img_size", default=224, type=int)
    p.add_argument("--layer", default="", type=str,
                   help="module path to visualize (default: last spatial)")
    p.add_argument("--class_idx", default=-1, type=int,
                   help="class to explain (-1: per-image argmax)")
    p.add_argument("--alpha", default=0.4, type=float)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--depth", default=2, type=int,
                   help="summary table nesting depth")
    p.add_argument("--out_dir", default="train_cls/visualize")
    p.add_argument("--model_ema", default=False,
                   type=lambda v: str(v).lower() in ("1", "true", "t", "yes"))
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                   help="cpu pins the platform at the config level "
                        "(JAX_PLATFORMS env alone cannot once the TPU "
                        "plugin is registered)")
    a = p.parse_args()
    if a.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    {"summary": run_summary, "gradcam": run_gradcam,
     "features": run_features}[a.mode](a)
