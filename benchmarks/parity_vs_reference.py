"""Two-framework parity harness (BASELINE.md row 1: val top-1 within 0.3% of
the reference on the same dataset/recipe/seed).

Runs the REFERENCE (`/root/reference/train.py`, PyTorch/timm) and THIS repo's
`train.py` with the same recipe + seed on the same image-folder dataset, then
reports the best-val-top-1 delta. The flag surface is identical by design
(SURVEY C1), so one recipe dict drives both CLIs.

The reference needs torch+timm+torchvision; this zero-egress TPU image ships
torch-cpu only, so the harness probes runnability first and degrades
gracefully — it still runs OUR side and emits a report with
`reference: unavailable (<reason>)`, ready to produce the full diff the
moment a torch/timm environment exists.

Usage:
    python benchmarks/parity_vs_reference.py --data_path /data/flower_photos \
        --model resnet50 --epochs 30 [--reference /root/reference]
    python benchmarks/parity_vs_reference.py --dry_run   # plumbing check

Writes benchmarks/parity_report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOLERANCE_PTS = 0.3


def recipe_flags(a) -> list[str]:
    """One recipe, both CLIs (flag names are reference-identical)."""
    return [
        "--data_path", a.data_path,
        "--model", a.model,
        "--epochs", str(a.epochs),
        "--batch_size", str(a.batch_size),
        "--input_size", str(a.input_size),
        "--lr", str(a.lr),
        "--seed", str(a.seed),
        "--train_split_rato", str(a.train_split_rato),
        "--pretrained", "false",
        "--auto_resume", "false",
        "--warmup_epochs", str(a.warmup_epochs),
    ]


def probe_reference(ref_dir: str) -> str | None:
    """None if the reference can run here, else the blocking reason."""
    if not os.path.isdir(ref_dir):
        return f"reference dir {ref_dir} not found"
    r = subprocess.run(
        [sys.executable, "-c", "import torch, timm, torchvision"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        missing = (r.stderr.strip().splitlines() or ["import failed"])[-1]
        return f"reference deps unavailable: {missing}"
    return None


def best_top1_from_log(log_path: Path) -> float | None:
    """Both frameworks append JSON lines with test_acc1 to train_cls/log.txt."""
    if not log_path.exists():
        return None
    best = None
    for line in log_path.read_text().splitlines():
        try:
            acc = json.loads(line).get("test_acc1")
        except json.JSONDecodeError:
            continue
        if acc is not None:
            best = acc if best is None else max(best, acc)
    return best


def run_framework(train_py: Path, flags: list[str], workdir: Path,
                  extra_flags: list[str], env_extra=None, dry_run=False):
    """Run one framework's train.py in its own cwd (both write ./train_cls/);
    returns (best_top1, cmd). dry_run skips execution."""
    workdir.mkdir(parents=True, exist_ok=True)
    cmd = [sys.executable, str(train_py)] + flags + extra_flags
    if dry_run:
        return None, cmd
    env = dict(os.environ)
    env.update(env_extra or {})
    log = workdir / "run.log"
    with open(log, "w") as f:
        r = subprocess.run(cmd, cwd=workdir, stdout=f, stderr=subprocess.STDOUT,
                           env=env)
    if r.returncode != 0:
        raise RuntimeError(f"{train_py} failed (rc={r.returncode}); see {log}")
    return best_top1_from_log(workdir / "train_cls" / "log.txt"), cmd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="/tmp/acceptance_ds")
    p.add_argument("--model", default="resnet50")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=88)
    p.add_argument("--train_split_rato", type=float, default=0.85)
    p.add_argument("--warmup_epochs", type=int, default=2)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--workdir", default="/tmp/parity_runs")
    p.add_argument("--device", default="tpu",
                   help="device for THIS repo's run (reference uses cuda/cpu)")
    p.add_argument("--dry_run", action="store_true",
                   help="construct commands + report without training")
    p.add_argument("--probe_only", action="store_true",
                   help="re-probe reference deps and refresh the existing "
                        "report's `reference`/`probed_at` fields in place — "
                        "the per-round re-check that torch/timm appeared "
                        "without re-running our 30-epoch side")
    p.add_argument("--out", default="")
    a = p.parse_args()
    if not a.out:
        # dry runs must not masquerade as measurement receipts
        name = "parity_report_dryrun.json" if a.dry_run else "parity_report.json"
        a.out = str(Path(__file__).parent / name)

    if a.probe_only:
        import datetime

        out = Path(a.out)
        report = json.loads(out.read_text()) if out.exists() else {}
        reason = probe_reference(a.reference)
        stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds")
        report["probed_at"] = datetime.date.today().isoformat()
        # full timestamps, one per probe: same-day rounds stay distinguishable
        report.setdefault("probe_history", []).append(
            {"at": stamp, "available": reason is None})
        if reason is None:
            report.setdefault("reference", {}).pop("unavailable", None)
            print("reference deps NOW AVAILABLE — rerun without "
                  "--probe_only to fill the delta")
        else:
            report["reference"] = {
                **report.get("reference", {}), "unavailable": reason,
            }
            print(f"reference still unavailable: {reason}")
        out.write_text(json.dumps(report, indent=2))
        return

    flags = recipe_flags(a)
    work = Path(a.workdir)
    report = {
        "dataset": a.data_path,
        "recipe": " ".join(flags),
        "tolerance_pts": TOLERANCE_PTS,
        "dry_run": bool(a.dry_run),
    }

    # ---- reference side ----
    reason = probe_reference(a.reference)
    ref_extra = ["--device", "cuda"]
    if reason is None or a.dry_run:
        try:
            ref_top1, ref_cmd = run_framework(
                Path(a.reference) / "train.py", flags, work / "reference",
                ref_extra, dry_run=a.dry_run or reason is not None,
            )
            report["reference"] = {"top1": ref_top1, "cmd": " ".join(ref_cmd)}
        except RuntimeError as e:
            report["reference"] = {"error": str(e)}
    if reason is not None:
        report["reference"] = {
            **report.get("reference", {}), "unavailable": reason,
        }

    # ---- this repo ----
    ours_extra = ["--device", a.device]
    ours_top1, ours_cmd = run_framework(
        REPO / "train.py", flags, work / "ours", ours_extra, dry_run=a.dry_run
    )
    report["ours"] = {"top1": ours_top1, "cmd": " ".join(ours_cmd)}

    # ---- verdict ----
    ref_top1 = report.get("reference", {}).get("top1")
    if ours_top1 is not None and ref_top1 is not None:
        delta = ours_top1 - ref_top1
        report["delta_pts"] = round(delta, 3)
        report["within_tolerance"] = abs(delta) <= TOLERANCE_PTS
    else:
        report["delta_pts"] = None
        report["within_tolerance"] = None
        if not a.dry_run and reason:
            print(f"NOTE: reference not runnable here ({reason}); "
                  "recorded our top-1 only — rerun in a torch/timm env for "
                  "the full diff", file=sys.stderr)

    Path(a.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
