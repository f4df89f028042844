"""Segmentation convergence receipt on real data (digits-derived masks).

No segmentation dataset exists offline in this zero-egress image, so this
derives one from sklearn's 1,797 real handwritten digits (the same source
benchmarks/realdata.py uses for the classification north star): each 8x8
digit is upsampled to 64x64 RGB, and its mask labels stroke pixels with
1 + digit_class (11 classes incl. background) — segmenting strokes from
background is easy, but assigning the CORRECT digit class to the stroke
requires the same shape recognition the classifier needs, so mIoU over the
10 digit classes is a real learning signal, not a thresholding exercise.

Runs seg_train.main (UPerNet + ConvNeXt-T, the reference recipe at toy
scale) and records mIoU / aAcc / wall clock into benchmarks/results.json
under "seg_digits_upernet". Reference analogue: the vendored ADE20K recipe
(semantic_segmentation/configs/convnext/upernet_convnext_tiny_512_160k_
ade20k_ss.py) — not runnable there without an external mmseg checkout.

Usage: python benchmarks/seg_receipt.py [--iters 300] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_seg_digits(root: str, size: int = 64, val_frac: float = 0.15) -> str:
    """Write the mmseg-layout digits segmentation dataset (idempotent)."""
    from PIL import Image
    from sklearn.datasets import load_digits

    root = Path(root)
    done = root / ".complete"
    if done.exists():
        return str(root)
    digits = load_digits()
    n = len(digits.images)
    rng = np.random.default_rng(0)
    order = rng.permutation(n)
    n_val = int(n * val_frac)
    for sub in ("images/training", "images/validation",
                "annotations/training", "annotations/validation"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    for rank, idx in enumerate(order):
        split = "validation" if rank < n_val else "training"
        img8 = digits.images[idx]                     # 8x8 float 0..16
        cls = int(digits.target[idx])
        arr = np.asarray(
            Image.fromarray((img8 / 16.0 * 255).astype(np.uint8))
            .resize((size, size), Image.BILINEAR))
        rgb = np.stack([arr] * 3, axis=-1)
        # stroke mask from the upsampled intensity; the 25% threshold keeps
        # stroke boundaries while dropping interpolation haze
        mask = np.where(arr > 64, 1 + cls, 0).astype(np.uint8)
        Image.fromarray(rgb).save(root / "images" / split / f"d{idx}.png")
        Image.fromarray(mask).save(root / "annotations" / split / f"d{idx}.png")
    done.touch()
    return str(root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--data_root", default="/tmp/seg_digits")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import shutil

    import seg_train

    data = build_seg_digits(args.data_root)
    # fresh workdir: a stale checkpoint-iterN.pth would auto-resume and the
    # "trained" receipt would record the old model with ~zero wall clock
    shutil.rmtree("/tmp/seg_digits_run", ignore_errors=True)
    out = Path("/tmp/seg_digits_run/train_seg/output")
    sargs = seg_train.get_args_parser().parse_args([
        "--data_path", data,
        "--config", "upernet_convnext_tiny_512_160k",
        "--crop_size", str(args.crop), "--batch_size", str(args.batch_size),
        "--total_iters", str(args.iters), "--warmup_iters", "50",
        "--log_interval", "25", "--output_dir", str(out),
    ])
    t0 = time.time()
    row = seg_train.main(sargs)
    wall = time.time() - t0

    rec = {
        "config": "seg_digits_upernet",
        "dataset": "sklearn load_digits -> stroke masks (11 classes)",
        "model": "upernet_convnext_tiny (60.1M)",
        "iters": args.iters,
        "batch": args.batch_size,
        "crop": args.crop,
        "miou": round(row["miou"], 4),
        "aacc": round(row["aacc"], 4),
        "wall_clock_s": round(wall, 1),
        "s_per_iter": round(wall / args.iters, 2),
        "device": args.device,
    }
    results = Path(__file__).parent / "results.json"
    rows = json.loads(results.read_text()) if results.exists() else []
    rows = [r for r in rows if r.get("config") != rec["config"]] + [rec]
    results.write_text(json.dumps(rows, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
