"""Record digits-convergence receipts from train run dirs into results.json.

The chip queue (pending_chip_runs.sh) trains models in /tmp run dirs; each
run's receipt lives in <run_dir>/train_cls/log.txt (one JSON line per epoch,
the reference's train_cls/log.txt format — /root/reference/train.py:391-397).
This script turns those logs into results.json rows so a receipt survives
even if the interactive session that launched the queue dies mid-round.

Usage:
  python benchmarks/record_digits_rows.py \
      --run config_name=/tmp/digits_swin_tiny [--model swin_tiny] \
      [--recipe "..."] [--device tpu] [--commit]

Rows are upserted by `config` (a rerun replaces its own row, never
duplicates). --commit makes a git commit mentioning the recorded configs.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import time
from pathlib import Path

RESULTS = Path(__file__).resolve().parent / "results.json"
REPO = Path(__file__).resolve().parent.parent

DEFAULT_RECIPE = ("scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + "
                  "mixup/cutmix, seed 88")


def row_from_run(config: str, run_dir: Path, model: str | None,
                 recipe: str, device: str) -> dict:
    log = run_dir / "train_cls" / "log.txt"
    lines = [json.loads(ln) for ln in log.read_text().splitlines() if ln.strip()]
    if not lines:
        raise SystemExit(f"{log} is empty — run incomplete?")
    accs = [ln["test_acc1"] for ln in lines]
    t0 = time.mktime(time.strptime(lines[0]["current_time"],
                                   "%Y-%m-%d %H:%M:%S"))
    t1 = time.mktime(time.strptime(lines[-1]["current_time"],
                                   "%Y-%m-%d %H:%M:%S"))
    n_epochs = lines[-1]["epoch"] + 1
    row = {
        "config": config,
        "dataset": "sklearn load_digits",
        "model": model or "?",
        "recipe": recipe,
        "epochs": n_epochs,
        "val_top1_best": round(max(accs), 3),
        "val_top1_final": round(accs[-1], 3),
        # epoch-0 line lands after epoch 0, so this is (n-1) epochs of wall
        # time — matching how earlier rows were recorded
        "wall_clock_s": round(t1 - t0, 1),
        "s_per_epoch": round((t1 - t0) / max(n_epochs - 1, 1), 2),
        "device": device,
    }
    if "test_acc1_ema" in lines[-1]:
        row["val_top1_best_ema"] = round(
            max(ln["test_acc1_ema"] for ln in lines), 3)
    return row


def upsert(rows: list[dict]) -> None:
    data = json.loads(RESULTS.read_text())
    by_cfg = {r.get("config"): i for i, r in enumerate(data)}
    for row in rows:
        if row["config"] in by_cfg:
            data[by_cfg[row["config"]]] = row
        else:
            data.append(row)
    RESULTS.write_text(json.dumps(data, indent=1) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="append", required=True,
                    metavar="CONFIG=RUN_DIR")
    ap.add_argument("--model", action="append", default=None,
                    help="model name per --run, in order")
    ap.add_argument("--recipe", default=DEFAULT_RECIPE)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--note", default=None,
                    help="free-text annotation stored as the row's ema_note")
    ap.add_argument("--commit", action="store_true")
    args = ap.parse_args()

    rows = []
    models = args.model or []
    for i, spec in enumerate(args.run):
        config, _, run_dir = spec.partition("=")
        model = models[i] if i < len(models) else None
        row = row_from_run(config, Path(run_dir), model,
                           args.recipe, args.device)
        if args.note:
            row["ema_note"] = args.note
        rows.append(row)
        print(json.dumps(rows[-1], indent=1))
    upsert(rows)
    print(f"recorded {len(rows)} row(s) -> {RESULTS}")

    if args.commit:
        cfgs = ", ".join(r["config"] for r in rows)
        # explicit pathspec: the self-recording queue may fire while
        # unrelated files are staged — only the results file belongs in
        # this receipt commit
        subprocess.run(
            ["git", "-C", str(REPO), "commit", "-m",
             f"Record convergence receipts: {cfgs}",
             "--", str(RESULTS.relative_to(REPO))],
            check=True,
        )


if __name__ == "__main__":
    main()
