"""Long-horizon convergence evidence on real data (VERDICT r2 item 8 /
BASELINE.md row 3: epoch wall-clock tracked per config).

Runs acceptance configs 3-5 on the sklearn-digits image-folder dataset
(1,797 real images — the largest offline-real dataset in this zero-egress
image) for >=20 epochs each, on chip:

  c3_ema        convnext_tiny + EMA (horizon-matched decay) + layer decay
                PASS: EMA top-1 >= raw top-1 - 2 pts
  c4_transfer   vit_tiny transfer: pretrain on digits 0-4 only (5 classes),
                then fine-tune on all 10 (num_classes differs -> the head is
                pruned on load, the real transfer path), vs the SAME recipe
                from scratch at equal epochs
                PASS: transfer >= scratch
  c5_rasampler  resnet18 + RASampler + EMA (the DP recipe; on one chip the
                data mesh is 1-wide, the sampler semantics are identical)
                PASS: top-1 > 90

Each row records best/final val top-1, wall clock, and s/epoch into
benchmarks/results.json (replacing same-config rows).

Usage: python benchmarks/convergence_digits.py [--epochs 20] [--device tpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from realdata import build_digits_folder  # noqa: E402

from imageclassification_tpu.config import TrainConfig  # noqa: E402


def run(tag: str, cfg: TrainConfig, epochs: int):
    import shutil

    import train as train_cli

    # fresh workdir: stale checkpoints would auto-resume and stale log.txt
    # lines would contaminate the best-top1 scan
    shutil.rmtree(Path(cfg.output_dir).parent, ignore_errors=True)
    t0 = time.time()
    train_cli.main(cfg)
    wall = time.time() - t0
    log = Path(cfg.output_dir).parent / "log.txt"
    lines = [json.loads(l) for l in open(log)]
    row = {
        "config": tag,
        "dataset": "sklearn load_digits",
        "model": cfg.model,
        "epochs": epochs,
        "val_top1_best": max(l.get("test_acc1", 0.0) for l in lines),
        "val_top1_final": lines[-1].get("test_acc1"),
        "wall_clock_s": round(wall, 1),
        "s_per_epoch": round(wall / epochs, 2),
    }
    if any("test_acc1_ema" in l for l in lines):
        row["val_top1_best_ema"] = max(
            l.get("test_acc1_ema", 0.0) for l in lines
        )
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--device", default="tpu")
    p.add_argument("--configs", default="c3,c4,c5",
                   help="comma list of configs to (re)run")
    p.add_argument("--out", default=str(Path(__file__).parent / "results.json"))
    a = p.parse_args()
    which = set(a.configs.split(","))

    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    data = build_digits_folder("/tmp/digits_ds")
    work = Path("/tmp/digits_convergence")

    def base(tag, **kw):
        d = dict(
            data_path=data, train_split_rato=0.85,
            output_dir=str(work / tag / "output"), log_dir=str(work / tag / "log"),
            input_size=64, batch_size=128, epochs=a.epochs, warmup_epochs=2,
            num_workers=8, device=a.device, pretrained=False,
            auto_resume=False, half_precision=a.device != "cpu",
            mixup=0.8, cutmix=1.0, smoothing=0.1,
            aa="rand-m9-mstd0.5-inc1", reprob=0.25,
        )
        d.update(kw)
        return TrainConfig(**d)

    # EMA half-life matched to the horizon: ~11 updates/epoch on digits
    n_updates = a.epochs * 11
    ema_decay = 0.5 ** (1.0 / max(n_updates / 4, 1))  # ~4 half-lives per run

    rows = []

    # --- c3: ConvNeXt-T + EMA + layer-wise LR decay ---
    if "c3" in which:
        r3 = run("c3_ema_digits", base(
            "c3", model="convnext_tiny", drop_path=0.1, model_ema=True,
            model_ema_decay=round(ema_decay, 4), layer_decay=0.9,
        ), a.epochs)
        r3["pass_ema_within_2pts"] = (
            r3.get("val_top1_best_ema", 0) >= r3["val_top1_best"] - 2.0
        )
        rows.append(r3)

    # --- c4: ViT transfer vs scratch at equal epochs ---
    # pretrain source: digits 0-4 only — a genuinely different (sub)task, so
    # the fine-tune exercises head pruning AND feature transfer. ViT-tiny on
    # 1.5k images cannot absorb the heavy mixup/cutmix recipe in this
    # horizon (measured ~20% top-1), so c4 uses the plain recipe — the same
    # choice the acceptance matrix makes for its transfer config.
    if "c4" in which:
        plain = dict(mixup=0.0, cutmix=0.0, aa="", reprob=0.0)
        half = Path("/tmp/digits_ds_04")
        if not half.is_dir():
            half.mkdir(parents=True)
            for c in range(5):
                (half / f"digit{c}").symlink_to(Path(data) / f"digit{c}")
        pre_epochs = max(a.epochs // 2, 5)
        run("c4_pretrain_source", base(
            "c4_pre", model="vit_tiny_patch16", epochs=pre_epochs,
            data_path=str(half), **plain,
        ), pre_epochs)
        r4s = run("c4_scratch", base(
            "c4_scratch", model="vit_tiny_patch16", epochs=a.epochs, **plain,
        ), a.epochs)
        r4t = run("c4_transfer", base(
            "c4_transfer", model="vit_tiny_patch16", epochs=a.epochs,
            pretrained=True,
            pretrained_path=str(work / "c4_pre" / "output"
                                / f"checkpoint-{pre_epochs - 1}.pth"),
            **plain,
        ), a.epochs)
        r4t["scratch_top1_equal_epochs"] = r4s["val_top1_best"]
        r4t["pass_transfer_beats_scratch"] = (
            r4t["val_top1_best"] >= r4s["val_top1_best"]
        )
        rows += [r4s, r4t]

    # --- c5: RASampler + EMA (DP recipe) ---
    if "c5" in which:
        r5 = run("c5_rasampler_digits", base(
            "c5", model="resnet18", RASampler=True, model_ema=True,
            model_ema_decay=round(ema_decay, 4),
        ), a.epochs)
        rows.append(r5)

    out = Path(a.out)
    existing = json.loads(out.read_text()) if out.exists() else []
    tags = {r["config"] for r in rows}
    existing = [r for r in existing if r.get("config") not in tags]
    existing.extend(rows)
    out.write_text(json.dumps(existing, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
