"""Segmentation train/eval machinery (TPU-first mmseg-EncoderDecoder analogue).

The reference defers segmentation training to an external mmsegmentation
harness (`semantic_segmentation/README.md:44-67` — tools/dist_train.sh with
IterBasedRunnerAmp); this module is the runnable TPU equivalent: ONE donated
jit train step (normalize → forward → per-pixel CE (+0.4-weighted FCN aux,
upernet_convnext.py:34-46) → grad → AdamW with per-iter poly LR injected from
a device array) and a jit eval step that accumulates a num_classes² confusion
matrix on device — mIoU falls out host-side at the end, no per-batch host
sync. Batches are sharded over the mesh's data axis, so BN in the decode
heads sees global-batch statistics (SyncBN) and gradients all-reduce over ICI
automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..data.augment import IMAGENET_MEAN, IMAGENET_STD
from ..engine.state import TrainState
from ..optim.factory import set_hyperparams

IGNORE_INDEX = 255  # mmseg convention: 255 = unlabeled, excluded everywhere


def _normalize(images_u8):
    """uint8 NHWC → ImageNet-normalized f32 (same constants the
    classification eval path uses)."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def seg_loss(main_logits, aux_logits, labels, aux_weight: float = 0.4):
    """Per-pixel CE averaged over non-ignored pixels, + aux_weight × the same
    on the FCN aux head (mmseg loss_decode CrossEntropyLoss wiring,
    upernet_convnext.py:31-33,45-46)."""
    valid = (labels != IGNORE_INDEX)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    denom = jnp.maximum(valid.sum(), 1).astype(jnp.float32)

    def ce(logits):
        px = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), safe)
        return jnp.where(valid, px, 0.0).sum() / denom

    loss = ce(main_logits)
    if aux_logits is not None:
        loss = loss + aux_weight * ce(aux_logits)
    return loss


def confusion_update(conf, logits, labels, num_classes: int):
    """conf[c_true, c_pred] += count — a one-hot einsum contraction
    (scatter-adds serialize on TPU). Ignores 255 AND any label outside
    [0, num_classes): out-of-range ids must not corrupt in-range rows.
    Accumulate at most ~2^24 pixels per float32 `conf` before draining to a
    wider host accumulator (build_seg_eval_step returns per-batch counts for
    exactly this reason)."""
    preds = jnp.argmax(logits, axis=-1).reshape(-1)
    lab = labels.reshape(-1)
    valid = (lab != IGNORE_INDEX) & (lab >= 0) & (lab < num_classes)
    lab = jnp.where(valid, lab, 0).astype(jnp.int32)
    t = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32) * valid[:, None]
    p = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    return conf + jnp.einsum("nt,np->tp", t, p)


def miou_from_confusion(conf):
    """(miou, per-class iou, overall pixel acc) from a [C, C] matrix; classes
    absent from BOTH prediction and label are excluded from the mean
    (mmseg nanmean semantics)."""
    import numpy as np

    conf = np.asarray(conf, np.float64)
    inter = np.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    present = union > 0
    iou = np.where(present, inter / np.maximum(union, 1), np.nan)
    miou = float(np.nanmean(np.where(present, iou, np.nan))) if present.any() else 0.0
    acc = float(inter.sum() / max(conf.sum(), 1.0))
    return miou, iou, acc


def build_seg_train_step(model, tx, lr_schedule, weight_decay: float,
                         aux_weight: float = 0.4) -> Callable:
    """train_step(state, images_u8, labels, rng) -> (state, loss). The poly LR
    array is a device-resident jit constant gathered by state.step; weight
    decay is constant across iters in the reference seg recipes."""
    lr_schedule = jnp.asarray(lr_schedule, jnp.float32)

    def loss_fn(params, batch_stats, images, labels, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            (main, aux), mut = model.apply(
                variables, images, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            main, aux = model.apply(
                variables, images, train=True, rngs={"dropout": rng})
            new_stats = batch_stats
        return seg_loss(main, aux, labels, aux_weight), new_stats

    def train_step(state: TrainState, images_u8, labels, rng):
        images = _normalize(images_u8)
        it = jnp.minimum(state.step, lr_schedule.shape[0] - 1)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, labels, rng)
        opt_state = set_hyperparams(state.opt_state, lr_schedule[it],
                                    weight_decay)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats, opt_state=opt_state), loss

    return train_step


def build_seg_eval_step(model, num_classes: int) -> Callable:
    """eval_step(state, images_u8, labels) -> this batch's [C, C] confusion
    counts (float32 on device; one batch is far below the 2^24 f32 integer
    ceiling). The caller accumulates into float64 host-side — full-dataset
    pixel counts overflow f32 (a 2000-image 512² val set has 5e8 pixels)
    and TPUs don't enable f64."""

    def eval_step(state: TrainState, images_u8, labels):
        images = _normalize(images_u8)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        main, _ = model.apply(variables, images, train=False)
        return confusion_update(
            jnp.zeros((num_classes, num_classes), jnp.float32),
            main, labels, num_classes)

    return eval_step


def sharded_whole_eval(eval_step, state, val_pairs, crop: int, batch: int,
                       num_classes: int, mesh) -> "np.ndarray":
    """Multi-process whole-image eval: rank-strided val shards, pad-batch
    stragglers, f64 host accumulation. Returns the GLOBAL [C, C] confusion
    matrix (identical on every process).

    `batch` is GLOBAL (train_batches contract): each process evaluates its
    rank-strided shard of val_pairs and contributes batch/world rows per
    step, so make_global_batch assembles a batch-sized global array with no
    duplicated images (the reference double-evaluates: every rank runs the
    full val set, train.py:139 SequentialSampler + engine.py:199). Every
    process runs the SAME number of steps — stragglers feed all-ignore pad
    batches — so the collective never deadlocks. Device returns per-batch
    f32 counts; accumulation is f64 on host because full-dataset pixel
    counts exceed f32's 2^24 integer ceiling."""
    import math

    import numpy as np

    from ..parallel.mesh import make_global_batch
    from .seg_data import val_batches

    world, rank = jax.process_count(), jax.process_index()
    local_batch = max(1, batch // world)
    local_pairs = val_pairs[rank::world]
    n_steps = math.ceil(math.ceil(len(val_pairs) / world) / local_batch)
    batches = val_batches(local_pairs, crop, batch=local_batch)
    conf = np.zeros((num_classes, num_classes), np.float64)
    for _ in range(n_steps):
        try:
            xs, ys = next(batches)
        except StopIteration:
            xs = np.zeros((0, crop, crop, 3), np.uint8)
            ys = np.zeros((0, crop, crop), np.int32)
        pad = local_batch - xs.shape[0]
        if pad:  # static batch shape: pad and mark padded rows ignore
            xs = np.concatenate(
                [xs, np.zeros((pad, crop, crop, 3), np.uint8)])
            ys = np.concatenate(
                [ys, np.full((pad, crop, crop), 255, np.int32)])
        xs = make_global_batch(mesh, xs)
        ys = make_global_batch(mesh, ys)
        conf += np.asarray(eval_step(state, xs, ys), np.float64)
    return conf


def slide_window_origins(size: int, crop: int, stride: int):
    """mmseg slide-test window origins: i*stride clamped so the last window
    sits flush with the edge (EncoderDecoder.slide_inference)."""
    if size <= crop:
        return [0]
    n = -(-(size - crop) // stride) + 1  # ceil + 1
    return sorted({min(i * stride, size - crop) for i in range(n)})


def slide_inference(window_fn, image_u8, num_classes: int, crop: int,
                    stride: int, window_batch: int = 8):
    """Full-resolution logits for ONE image by sliding crop² windows at
    `stride` and averaging overlapping logits (mmseg test_cfg mode='slide',
    the reference ss recipes' eval: upernet_convnext_tiny_...ss.py:33 —
    crop 512, stride 341; 426 for the 640 recipes). Windows are chunked into
    fixed `window_batch`-sized calls (tail zero-padded), so `window_fn` is
    traced for exactly ONE shape no matter how image sizes vary across the
    val set — variable-shaped calls would recompile per distinct window
    count."""
    import numpy as np

    H, W = image_u8.shape[:2]
    Hp, Wp = max(H, crop), max(W, crop)
    img = np.zeros((Hp, Wp, 3), image_u8.dtype)
    img[:H, :W] = image_u8
    acc = np.zeros((Hp, Wp, num_classes), np.float32)
    cnt = np.zeros((Hp, Wp, 1), np.float32)
    wins = [(y, x) for y in slide_window_origins(Hp, crop, stride)
            for x in slide_window_origins(Wp, crop, stride)]
    for i in range(0, len(wins), window_batch):
        chunk = wins[i:i + window_batch]
        batch = np.zeros((window_batch, crop, crop, 3), image_u8.dtype)
        for j, (y, x) in enumerate(chunk):
            batch[j] = img[y:y + crop, x:x + crop]
        logits = np.asarray(window_fn(batch), np.float32)
        for (y, x), l in zip(chunk, logits):
            acc[y:y + crop, x:x + crop] += l
            cnt[y:y + crop, x:x + crop] += 1.0
    return acc[:H, :W] / cnt[:H, :W]


def seg_decay_scales(params, decay_type: str, decay_rate: float,
                     num_layers: int = 12):
    """Per-leaf LR scales for the UPerNet tree, matching the reference's
    LearningRateDecayOptimizerConstructor exactly
    (layer_decay_optimizer_constructor.py:45-54,100):

    stage_wise (with N = num_layers + 2): backbone stem/downsample → id 0,
    backbone stage i → id i+1, everything else (decode heads, out-norms) →
    id N-1; scale = decay_rate^(N - id - 1). layer_wise reuses the
    classification 12-layer ConvNeXt map on the backbone subtree
    (optim/layer_decay.py), heads at scale 1.0."""
    import re

    from ..optim.layer_decay import layer_decay_scales

    if decay_type == "layer_wise":
        bb_scales = layer_decay_scales(params["backbone"], "convnext",
                                       decay_rate)
        return {
            k: (bb_scales if k == "backbone"
                else jax.tree.map(lambda _: jnp.float32(1.0), v))
            for k, v in params.items()
        }

    n = num_layers + 2

    def leaf_id(path) -> int:
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if parts[0] != "backbone":
            return n - 1
        p = parts[1]
        if p.startswith(("stem", "downsample_")):
            return 0
        if (m := re.match(r"stage(\d+)_block", p)):
            return int(m.group(1)) + 1
        return n - 1  # backbone out-norms: 'else' branch in the reference

    return jax.tree_util.tree_map_with_path(
        lambda path, _: jnp.float32(decay_rate ** (n - leaf_id(path) - 1)),
        params)


def create_seg_optimizer(lr: float, weight_decay: float, decay_scales=None):
    """AdamW betas (0.9, 0.999), wd on kernels only (the reference seg
    recipes' optimizer, upernet_convnext_tiny_...ss.py:36-40; the no-decay
    set — norms/biases — matches its paramwise no_decay grouping). When
    `decay_scales` is given, each update leaf is scaled AFTER the decayed
    weights are added and BEFORE the LR — torch semantics, where the group
    lr = lr_scale * base_lr multiplies adam term and weight decay alike."""
    from ..optim.factory import _scale_by_leaf

    def decay_mask(p):
        return jax.tree.map(lambda x: x.ndim >= 2, p)

    def builder(learning_rate, weight_decay):
        chain = [
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
        ]
        if decay_scales is not None:
            chain.append(_scale_by_leaf(decay_scales))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(builder)(
        learning_rate=lr, weight_decay=weight_decay)


def transfer_backbone(model, variables, classifier_ckpt: str):
    """Seed the UPerNet backbone from a classification checkpoint (the
    reference's init_cfg/load_checkpoint path, backbone/convnext.py:110-138),
    pruning head/norm keys that don't exist in the pyramid view."""
    from ..checkpoint.io import load_checkpoint, load_params_with_pruning

    ck = load_checkpoint(classifier_ckpt)
    params = dict(variables["params"])
    bb = params.get("backbone", params)  # UPerNet names the encoder 'backbone'
    merged, skipped = load_params_with_pruning(bb, ck["model"])
    params["backbone"] = merged
    print(f"backbone transfer: {skipped} mismatched keys skipped")
    return {**variables, "params": params}
