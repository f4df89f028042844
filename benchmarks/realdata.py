"""North-star convergence run on REAL data (BASELINE.md row 1).

BASELINE.json's north star is val top-1 on flower_photos vs a reference run.
Neither flower_photos nor timm is obtainable in this zero-egress image, so
this harness uses the largest genuine image dataset available offline:
sklearn's bundled `load_digits` (1,797 real 8x8 handwritten digits, 10
classes, UCI optdigits). Each digit is upsampled to 64x64 RGB and written as
an image-folder dataset, then BASELINE config 2 (ResNet-50 + RandAugment +
mixup/cutmix + cosine + smoothing — the reference's heavy-augmentation
recipe) trains from scratch through the normal train.py CLI path.

Records val top-1 / top-5 + per-epoch wall clock into benchmarks/results.json
under "north_star_digits". A same-recipe reference (torch/timm) run is not
executable offline; the number recorded here is the framework's own
measured convergence on real data, for cross-checking whenever a reference
environment exists.

Usage:  python benchmarks/realdata.py [--epochs 30] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imageclassification_tpu.config import TrainConfig  # noqa: E402


def build_digits_folder(root: str, size: int = 64) -> str:
    from PIL import Image
    from sklearn.datasets import load_digits

    root = Path(root)
    if root.is_dir() and any(root.iterdir()):
        return str(root)
    digits = load_digits()
    for i, (img8, label) in enumerate(zip(digits.images, digits.target)):
        d = root / f"digit{label}"
        d.mkdir(parents=True, exist_ok=True)
        arr = np.clip(img8 / 16.0 * 255.0, 0, 255).astype(np.uint8)
        im = Image.fromarray(arr, mode="L").convert("RGB")
        im = im.resize((size, size), Image.BICUBIC)
        im.save(d / f"{i}.jpg", quality=95)
    return str(root)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--device", default="tpu")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--out", default=str(Path(__file__).parent / "results.json"))
    a = p.parse_args()

    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    data = build_digits_folder("/tmp/digits_ds")
    work = Path("/tmp/digits_run")

    cfg = TrainConfig(
        data_path=data, train_split_rato=0.85,
        output_dir=str(work / "output"), log_dir=str(work / "log"),
        model="resnet50", input_size=64, batch_size=a.batch_size,
        epochs=a.epochs, warmup_epochs=2,
        mixup=0.8, cutmix=1.0, smoothing=0.1,
        aa="rand-m9-mstd0.5-inc1", reprob=0.25,
        num_workers=8, device=a.device, pretrained=False, auto_resume=False,
        half_precision=a.device != "cpu",
    )

    import train as train_cli

    t0 = time.time()
    train_cli.main(cfg)
    wall = time.time() - t0

    lines = [json.loads(l) for l in open(work / "log.txt")]
    best = max(l.get("test_acc1", 0.0) for l in lines)
    result = {
        "config": "north_star_digits",
        "dataset": "sklearn load_digits (1797 real handwritten digits, 10 cls)",
        "recipe": "BASELINE config 2: resnet50 + rand-m9 + mixup/cutmix + cosine",
        "epochs": a.epochs,
        "val_top1_best": best,
        "val_top1_final": lines[-1].get("test_acc1"),
        "wall_clock_s": round(wall, 1),
        "s_per_epoch": round(wall / a.epochs, 2),
        "device": a.device,
    }
    print(json.dumps(result))

    out = Path(a.out)
    existing = json.loads(out.read_text()) if out.exists() else []
    existing = [r for r in existing if r.get("config") != "north_star_digits"]
    existing.append(result)
    out.write_text(json.dumps(existing, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
