"""Convergence receipts for the beyond-reference distillation and pruning
features (reference README todo #5 '量化/剪枝/蒸馏'; quantization receipts
live in int8_bench.json), on the sklearn-digits image-folder dataset.

  distill   resnet18 student, 30 epochs, heavy recipe — distilled from the
            97.8%-top-1 resnet50 parity teacher vs the SAME recipe/seed from
            scratch.            PASS: distilled best top-1 >= scratch
  prune     the resnet50 teacher pruned to 50% global sparsity: val top-1
            before pruning, after one-shot pruning (no retrain), and after a
            --prune_mask sparse fine-tune (sparsity verified intact in the
            saved checkpoint).
                                PASS: fine-tune recovers to >= fp32 - 2 pts

The teacher is the parity-receipt checkpoint (benchmarks/parity_report.json
recipe); if missing it is retrained with that exact recipe first.

Usage: python benchmarks/distill_prune_receipt.py [--which distill,prune]
       [--device tpu] [--epochs 30] [--finetune_epochs 10]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import pickle
import re
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from realdata import build_digits_folder  # noqa: E402

from imageclassification_tpu.config import TrainConfig  # noqa: E402

TEACHER_DEFAULT = "/tmp/parity_runs/ours/train_cls/output/checkpoint-best.pth"
WORK = Path("/tmp/digits_distill_prune")


def run_train(tag: str, cfg: TrainConfig, epochs: int) -> dict:
    import train as train_cli

    shutil.rmtree(Path(cfg.output_dir).parent, ignore_errors=True)
    t0 = time.time()
    train_cli.main(cfg)
    wall = time.time() - t0
    lines = [json.loads(l)
             for l in open(Path(cfg.output_dir).parent / "log.txt")]
    return {
        "config": tag,
        "dataset": "sklearn load_digits",
        "model": cfg.model,
        "epochs": epochs,
        "val_top1_best": max(l.get("test_acc1", 0.0) for l in lines),
        "val_top1_final": lines[-1].get("test_acc1"),
        "wall_clock_s": round(wall, 1),
        "s_per_epoch": round(wall / epochs, 2),
    }


def run_eval(cfg: TrainConfig) -> float:
    """train.py --eval true prints the val top-1; parse it from stdout."""
    import train as train_cli

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return sys.__stdout__.write(s)

    with contextlib.redirect_stdout(Tee()):
        train_cli.main(cfg)
    m = re.findall(r"test images:\s*([0-9.]+)%", buf.getvalue())
    assert m, "eval-only run printed no accuracy line"
    return float(m[-1])


def ensure_teacher(data: str, device: str, path: str) -> str:
    if Path(path).is_file():
        return path
    # retrain with the parity recipe (benchmarks/parity_report.json)
    print(f"teacher missing at {path} — retraining with the parity recipe")
    out = WORK / "teacher"
    cfg = TrainConfig(
        data_path=data, model="resnet50", epochs=30, batch_size=128,
        input_size=64, lr=0.001, seed=88, train_split_rato=0.85,
        pretrained=False, auto_resume=False, warmup_epochs=2,
        num_workers=8, device=device, half_precision=device != "cpu",
        output_dir=str(out / "output"), log_dir=str(out / "log"),
    )
    run_train("teacher_resnet50", cfg, 30)
    return str(out / "output" / "checkpoint-best.pth")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="distill,prune")
    p.add_argument("--device", default="tpu")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--finetune_epochs", type=int, default=15)
    # full scratch lr (not a transfer-style 1e-4): the masked fine-tune must
    # re-learn the pruned kernels' capacity, not just adapt a head
    p.add_argument("--finetune_lr", type=float, default=1e-3)
    p.add_argument("--teacher", default=TEACHER_DEFAULT)
    p.add_argument("--out", default=str(Path(__file__).parent / "results.json"))
    a = p.parse_args()
    which = set(a.which.split(","))

    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    data = build_digits_folder("/tmp/digits_ds")
    teacher = ensure_teacher(data, a.device, a.teacher)

    def base(tag, **kw):
        d = dict(
            data_path=data, train_split_rato=0.85, seed=88,
            output_dir=str(WORK / tag / "output"),
            log_dir=str(WORK / tag / "log"),
            input_size=64, batch_size=128, epochs=a.epochs, warmup_epochs=2,
            num_workers=8, device=a.device, pretrained=False,
            auto_resume=False, half_precision=a.device != "cpu",
            mixup=0.8, cutmix=1.0, smoothing=0.1,
            aa="rand-m9-mstd0.5-inc1", reprob=0.25,
        )
        d.update(kw)
        return TrainConfig(**d)

    rows = []

    if "distill" in which:
        rs = run_train("distill_scratch_resnet18",
                       base("d_scratch", model="resnet18"), a.epochs)
        rd = run_train("distill_kd_resnet18", base(
            "d_kd", model="resnet18", teacher_path=teacher,
            distillation_alpha=0.5, distillation_tau=4.0,
        ), a.epochs)
        rd["teacher"] = teacher
        rd["scratch_top1_equal_epochs"] = rs["val_top1_best"]
        rd["pass_distill_beats_scratch"] = (
            rd["val_top1_best"] >= rs["val_top1_best"]
        )
        rows += [rs, rd]

    if "prune" in which:
        from modelchange import prune_model

        def eval_ckpt(ckpt):
            return run_eval(base(
                "p_eval", eval=True, resume=ckpt, model="resnet50",
            ))

        top1_fp32 = eval_ckpt(teacher)
        pruned = prune_model(
            teacher, sparsity=0.5, scope="global",
            out_path=str(WORK / "teacher-pruned0.5.pth"),
        )
        top1_pruned = eval_ckpt(pruned)
        rf = run_train("prune_finetune_resnet50", base(
            "p_ft", model="resnet50", epochs=a.finetune_epochs,
            pretrained=True, pretrained_path=pruned, prune_mask=True,
            lr=a.finetune_lr, warmup_epochs=1,
            mixup=0.0, cutmix=0.0, aa="", reprob=0.0,  # plain fine-tune
        ), a.finetune_epochs)

        # verify the saved fine-tuned checkpoint kept the zero pattern
        src = pickle.load(open(pruned, "rb"))["model"]
        fin = pickle.load(open(
            WORK / "p_ft" / "output" / "checkpoint-best.pth", "rb"))["model"]
        zeros_kept = all(
            np.all(fin[k][src[k] == 0] == 0)
            for k, v in fin.items()
            if k.endswith("kernel") and v.ndim >= 2 and v.size > 4096
            and not k.endswith("head/kernel")  # classifiers never pruned
        )
        row = {
            "config": "prune_resnet50_global0.5",
            "dataset": "sklearn load_digits",
            "model": "resnet50",
            "teacher": teacher,
            "val_top1_fp32": top1_fp32,
            "val_top1_pruned_oneshot": top1_pruned,
            "val_top1_finetuned_best": rf["val_top1_best"],
            "finetune_epochs": a.finetune_epochs,
            "sparsity_intact_after_finetune": bool(zeros_kept),
            "pass_recovers_within_2pts": (
                rf["val_top1_best"] >= top1_fp32 - 2.0 and zeros_kept
            ),
            "s_per_epoch_finetune": rf["s_per_epoch"],
        }
        rows.append(row)

    out = Path(a.out)
    existing = json.loads(out.read_text()) if out.exists() else []
    tags = {r["config"] for r in rows}
    existing = [r for r in existing if r.get("config") not in tags]
    existing.extend(rows)
    out.write_text(json.dumps(existing, indent=2))
    print(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
