"""Runnable UPerNet+ConvNeXt semantic-segmentation fine-tune (TPU-native).

The reference ships segmentation as *configs only* and defers training to an
external mmsegmentation checkout (`semantic_segmentation/README.md:44-67`:
`tools/dist_train.sh configs/convnext/upernet_convnext_tiny_512_160k_ade20k_ss.py 8`).
This CLI is the runnable TPU equivalent of that command — same recipe
(UPerHead+FCN aux over the ConvNeXt pyramid, AdamW, poly LR with 1500-iter
warmup, iter-based running), one compiled step per batch, batch sharded over
the device mesh (BN in the heads is SyncBN by construction).

    python seg_train.py --data_path /data/ade_like \
        --config upernet_convnext_tiny_512_160k \
        --pretrained_path train_cls/output/checkpoint-best.pth

Dataset layout + pipeline: imageclassification_tpu/downstream/seg_data.py.
Checkpoints (checkpoint-iter{N}.pth / checkpoint-best.pth, auto-resume) reuse
the classification framework's writer, so val/visualize tooling can read them.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from imageclassification_tpu.downstream.configs import SEGMENTATION_CONFIGS
from imageclassification_tpu.downstream.seg_data import (
    num_classes_from_masks, scan_pairs, train_batches)
from imageclassification_tpu.downstream.seg_engine import (
    build_seg_eval_step, build_seg_train_step, create_seg_optimizer,
    miou_from_confusion, seg_decay_scales, sharded_whole_eval,
    transfer_backbone)
from imageclassification_tpu.downstream.upernet import build_upernet
from imageclassification_tpu.engine.state import TrainState
from imageclassification_tpu.optim.schedules import poly_scheduler
from imageclassification_tpu.parallel.dist import init_distributed_mode
from imageclassification_tpu.parallel.mesh import (
    make_global_batch, make_mesh, shard_params)


def get_args_parser():
    p = argparse.ArgumentParser("TPU UPerNet segmentation", add_help=False)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--config", type=str,
                   default="upernet_convnext_tiny_512_160k",
                   choices=sorted(SEGMENTATION_CONFIGS))
    p.add_argument("--num_classes", type=int, default=0,
                   help="0 = auto from the training masks")
    p.add_argument("--batch_size", type=int, default=0,
                   help="global; 0 = the recipe's 16 (2 img x 8 GPUs)")
    p.add_argument("--crop_size", type=int, default=0,
                   help="0 = the recipe's crop (512/640)")
    p.add_argument("--total_iters", type=int, default=0,
                   help="0 = the recipe's 160k")
    p.add_argument("--warmup_iters", type=int, default=-1)
    p.add_argument("--lr", type=float, default=0.0, help="0 = recipe lr")
    p.add_argument("--pretrained_path", type=str, default="",
                   help="classification checkpoint to seed the backbone")
    p.add_argument("--output_dir", type=str, default="train_seg/output")
    p.add_argument("--eval_mode", type=str, default="whole",
                   choices=["whole", "slide", "ms"],
                   help="whole: squash-resize to crop (fast); slide: "
                        "full-resolution crop×crop windows at the recipe "
                        "stride (mmseg ss test_cfg, ...ss.py:33); ms: slide "
                        "at 6 scales × hflip with softmax averaging (the "
                        "reference *_ms configs' --aug-test protocol)")
    p.add_argument("--eval_interval", type=int, default=0,
                   help="0 = eval only at the end")
    p.add_argument("--save_ckpt_interval", type=int, default=0,
                   help="0 = save only at the end")
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--half_precision", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--mesh_shape", type=str, default="")
    p.add_argument("--dist_on_itp", action="store_true")
    p.add_argument("--dist_url", default="env://")
    return p


def main(args):
    init_distributed_mode(args)
    mesh = make_mesh(args.mesh_shape)

    cfg = SEGMENTATION_CONFIGS[args.config]
    crop = args.crop_size or cfg.crop_size
    batch = args.batch_size or cfg.batch_per_host
    total_iters = args.total_iters or cfg.total_iters
    warmup = cfg.warmup_iters if args.warmup_iters < 0 else args.warmup_iters
    warmup = min(warmup, max(total_iters - 1, 0))
    lr = args.lr or cfg.lr

    n_dev = len(mesh.devices.flatten())
    if batch % n_dev:  # batch shards over the mesh (train.py:276-280 check)
        batch = max(n_dev, (batch // n_dev) * n_dev)
        print(f"batch rounded to {batch} to divide across {n_dev} devices")

    train_pairs = scan_pairs(args.data_path, "training")
    val_pairs = scan_pairs(args.data_path, "validation")
    num_classes = args.num_classes or num_classes_from_masks(train_pairs)
    print(f"{len(train_pairs)} train / {len(val_pairs)} val pairs, "
          f"{num_classes} classes, crop {crop}, batch {batch}, "
          f"{total_iters} iters")

    model, _ = build_upernet(args.config, num_classes,
                             half_precision=args.half_precision)

    rng = jax.random.key(args.seed)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros((1, crop, crop, 3), jnp.float32), train=False)
    if args.pretrained_path:
        variables = transfer_backbone(model, variables, args.pretrained_path)
    # the recipe's backbone LR decay (stage_wise 0.9 everywhere; tiny uses
    # paramwise num_layers 6, the rest 12 — reference
    # upernet_convnext_*_ss.py optimizer paramwise_cfg)
    scales = seg_decay_scales(variables["params"], cfg.decay_type,
                              cfg.layer_decay_rate, cfg.layer_decay_num_layers)
    tx = create_seg_optimizer(lr, cfg.weight_decay, decay_scales=scales)
    state = TrainState(
        step=jnp.zeros([], jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"UPerNet({cfg.backbone}): {n_params / 1e6:.1f}M params")

    # auto-resume from the highest checkpoint-iter{N}.pth (the classification
    # CLI's auto_load_model semantics, iteration-based). Load BEFORE
    # shard_params, like train.py — loading replaces leaves with host arrays,
    # so sharding must come after.
    start_iter = 0
    latest = _find_latest_iter_ckpt(args.output_dir)
    if latest is not None:
        from imageclassification_tpu.checkpoint.io import (
            load_checkpoint, load_params_with_pruning)

        path, start_iter = latest
        print(f"Auto resume checkpoint: {path}")
        ck = load_checkpoint(path)
        params, missing = load_params_with_pruning(state.params, ck["model"])
        state = state.replace(params=params)
        if ck.get("batch_stats") and state.batch_stats:
            bs, _ = load_params_with_pruning(
                state.batch_stats, ck["batch_stats"], verbose=False)
            state = state.replace(batch_stats=bs)
        # restore step unconditionally: the data loop resumes at start_iter,
        # and a step left at 0 would silently restart the poly LR schedule
        # from warmup mid-run even when the optimizer state couldn't load
        state = state.replace(
            step=jnp.asarray(ck.get("step", start_iter), jnp.int32))
        if missing == 0 and "optimizer" in ck:
            opt, _ = load_params_with_pruning(
                state.opt_state, ck["optimizer"], verbose=False)
            state = state.replace(opt_state=opt)
            print("With optim & sched!")
    state = shard_params(mesh, state)

    lr_values = poly_scheduler(lr, total_iters, power=cfg.power,
                               min_value=cfg.min_lr, warmup_iters=warmup)
    train_step = jax.jit(
        build_seg_train_step(model, tx, lr_values, cfg.weight_decay),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(build_seg_eval_step(model, num_classes))

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir.parent / "log.txt"
    from imageclassification_tpu.parallel.dist import is_main_process
    from imageclassification_tpu.utils.loggers import TensorboardLogger
    tb = (TensorboardLogger(str(out_dir.parent / "log_dir"))
          if is_main_process() else None)
    save_args = SimpleNamespace(output_dir=str(out_dir), model_ema=False,
                                save_ckpt_num=3, save_ckpt_freq=1)
    model_spec = {"task": "segmentation", "config": args.config,
                  "num_classes": num_classes, "crop_size": crop}

    def evaluate(state):
        if args.eval_mode in ("slide", "ms"):
            return _evaluate_slide(state, ms=args.eval_mode == "ms")
        # module-level so the 2-process test exercises the exact production
        # path (rank-strided shards, pad-batch stragglers, f64 accumulation)
        conf = sharded_whole_eval(eval_step, state, val_pairs, crop, batch,
                                  num_classes, mesh)
        miou, iou, acc = miou_from_confusion(conf)
        return miou, iou, acc

    @jax.jit
    def _window_logits(state, windows_u8):
        from imageclassification_tpu.downstream.seg_engine import _normalize

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        main, _ = model.apply(variables, _normalize(windows_u8), train=False)
        return main

    def _evaluate_slide(state, ms: bool = False):
        # full-resolution windowed inference; ms averages SOFTMAX probs over
        # 6 scales × hflip (mmseg MultiScaleFlipAug img_ratios + aug_test
        # averaging — the reference *_ms configs defer exactly this to the
        # external harness's --aug-test, semantic_segmentation/README.md:49)
        from PIL import Image

        from imageclassification_tpu.downstream.seg_engine import (
            slide_inference)

        ratios = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75) if ms else (1.0,)
        flips = (False, True) if ms else (False,)
        # recipe stride 341 for crop 512; scale with a crop override so
        # stride <= crop always holds (mmseg asserts the same)
        stride = max(1, round(cfg.eval_stride * crop / cfg.crop_size))
        window_fn = lambda w: _window_logits(state, jnp.asarray(w))
        conf = np.zeros((num_classes, num_classes), np.float64)
        for img_p, ann_p in val_pairs:
            pil = Image.open(img_p).convert("RGB")
            lab = np.asarray(Image.open(ann_p)).astype(np.int64)
            H, W = lab.shape[:2]
            prob = np.zeros((H, W, num_classes), np.float64)
            for r in ratios:
                im = pil if r == 1.0 else pil.resize(
                    (max(1, round(pil.width * r)),
                     max(1, round(pil.height * r))), Image.BILINEAR)
                arr = np.asarray(im, np.uint8)
                for flip in flips:
                    a = arr[:, ::-1] if flip else arr
                    logits = slide_inference(window_fn, np.ascontiguousarray(a),
                                             num_classes, crop, stride)
                    if flip:
                        logits = logits[:, ::-1]
                    e = np.exp(logits - logits.max(-1, keepdims=True))
                    p = e / e.sum(-1, keepdims=True)
                    if p.shape[:2] != (H, W):  # back to label resolution
                        p = np.stack([
                            np.asarray(Image.fromarray(p[..., c]).resize(
                                (W, H), Image.BILINEAR))
                            for c in range(num_classes)], axis=-1)
                    prob += p
            pred = prob.argmax(-1)
            # same validity rule as confusion_update: 255 AND any id
            # outside [0, num_classes) are excluded, not crashed on
            valid = (lab != 255) & (lab >= 0) & (lab < num_classes)
            idx = lab[valid] * num_classes + pred[valid]
            conf += np.bincount(
                idx.ravel(), minlength=num_classes * num_classes
            ).reshape(num_classes, num_classes)
        return miou_from_confusion(conf)

    step_rng = jax.random.key(args.seed + 1)
    t0 = time.time()
    best_miou = -1.0
    loss_avg, n_since = 0.0, 0
    for it, xs, ys in train_batches(train_pairs, crop, batch, total_iters,
                                    args.seed, start=start_iter,
                                    rank=jax.process_index(),
                                    world=jax.process_count()):
        xs = make_global_batch(mesh, xs)
        ys = make_global_batch(mesh, ys)
        state, loss = train_step(state, xs, ys,
                                 jax.random.fold_in(step_rng, it))
        loss_avg += float(loss)
        n_since += 1
        last = it + 1 == total_iters
        if (it + 1) % args.log_interval == 0 or last:
            print(f"iter {it + 1}/{total_iters} loss {loss_avg / n_since:.4f} "
                  f"lr {lr_values[min(it, len(lr_values) - 1)]:.2e} "
                  f"({(time.time() - t0) / (it + 1 - start_iter):.2f}s/iter)")
            if tb is not None:
                tb.update(head="loss", step=it + 1,
                          loss=loss_avg / n_since)
                tb.update(head="opt", step=it + 1,
                          lr=float(lr_values[min(it, len(lr_values) - 1)]))
            loss_avg, n_since = 0.0, 0
        if args.eval_interval and ((it + 1) % args.eval_interval == 0) \
                and not last:
            miou, _, acc = evaluate(state)
            print(f"iter {it + 1}: mIoU {miou * 100:.2f} aAcc {acc * 100:.2f}")
            if tb is not None:
                tb.update(head="perf", step=it + 1, miou=miou, aacc=acc)
            if miou > best_miou:
                _save_best(miou, state, save_args, crop, num_classes,
                           model_spec)
                best_miou = miou
            with open(log_path, "a") as f:
                f.write(json.dumps({"iter": it + 1, "miou": miou,
                                    "aacc": acc}) + "\n")
        if args.save_ckpt_interval and (it + 1) % args.save_ckpt_interval == 0:
            from imageclassification_tpu.checkpoint.io import save_model
            save_model(save_args, (1, crop, crop, 3), f"iter{it + 1}", state,
                       num_classes, model_spec)
            _prune_iter_ckpts(args.output_dir, keep=save_args.save_ckpt_num)

    miou, iou, acc = evaluate(state)
    if miou > best_miou:
        _save_best(miou, state, save_args, crop, num_classes, model_spec)
        best_miou = miou
    per_class = {f"iou_{i}": (None if np.isnan(v) else round(float(v), 4))
                 for i, v in enumerate(iou)}
    row = {"iter": total_iters, "miou": miou, "aacc": acc,
           "wall_clock_s": round(time.time() - t0, 1), **per_class}
    print(f"final: mIoU {miou * 100:.2f} aAcc {acc * 100:.2f} "
          f"(best {best_miou * 100:.2f})")
    if tb is not None:
        tb.update(head="perf", step=total_iters, miou=miou, aacc=acc)
        tb.flush()
    with open(log_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    from imageclassification_tpu.checkpoint.io import (save_model,
                                                       wait_for_pending_saves)
    save_model(save_args, (1, crop, crop, 3), f"iter{total_iters}", state,
               num_classes, model_spec)
    wait_for_pending_saves()
    return row


def _find_latest_iter_ckpt(output_dir):
    """(path, iter) of the highest checkpoint-iter{N}.pth, or None."""
    import glob
    import re

    best = None
    for p in glob.glob(os.path.join(output_dir, "checkpoint-iter*.pth")):
        m = re.fullmatch(r"checkpoint-iter(\d+)\.pth", os.path.basename(p))
        if m and (best is None or int(m.group(1)) > best[1]):
            best = (p, int(m.group(1)))
    return best


def _prune_iter_ckpts(output_dir, keep: int):
    """Rolling retention for iteration checkpoints: the classification
    writer's deletion rule only parses integer epoch names
    (checkpoint/io.py:160-166), so 'iterN' files need their own pruning —
    without it a 160k-iter run accumulates hundreds of ~0.7 GB files."""
    import glob
    import re

    from imageclassification_tpu.checkpoint.io import (is_main_process,
                                                       wait_for_pending_saves)

    if not is_main_process():
        return
    wait_for_pending_saves()
    found = []
    for p in glob.glob(os.path.join(output_dir, "checkpoint-iter*.pth")):
        m = re.fullmatch(r"checkpoint-iter(\d+)\.pth", os.path.basename(p))
        if m:
            found.append((int(m.group(1)), p))
    for _, p in sorted(found)[:-keep] if keep > 0 else []:
        os.remove(p)


def _save_best(miou, state, save_args, crop, num_classes, model_spec):
    from imageclassification_tpu.checkpoint.io import save_model
    save_model(save_args, (1, crop, crop, 3), "best", state, num_classes,
               dict(model_spec, miou=miou))


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    main(args)
