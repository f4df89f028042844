#!/bin/bash
# Round-5 follow-ups after the merged-layout ship (self-recording).
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HERE="$REPO/benchmarks"

# 1. fresh per-op trace of the shipped (merged) layout — the committed
#    trace_ops_swin_tiny.json documented the legacy layout (git history
#    keeps it; BREAKDOWN cites both)
BENCH_MODEL=swin_tiny python "$HERE/profile_trace.py" && {
  git -C "$REPO" add benchmarks/trace_ops_swin_tiny.json
  git -C "$REPO" commit -m "Swin-T per-op chip trace with merged layout" \
    -- benchmarks/trace_ops_swin_tiny.json || true
}

# 2. 120-epoch swin_tiny convergence (same recipe as the 30-epoch row,
#    4x the horizon): the 28.5% receipt's curve was still climbing
if ! grep -q '"epoch": 119' /tmp/digits_swin120/train_cls/log.txt 2>/dev/null
then
  mkdir -p /tmp/digits_swin120 && cd /tmp/digits_swin120
  python "$REPO/train.py" --data_path /tmp/digits_ds \
    --train_split_rato 0.85 --model swin_tiny --input_size 224 \
    --batch_size 128 --epochs 120 --warmup_epochs 5 --seed 88 \
    --pretrained false --num_workers 8 --aa rand-m9-mstd0.5-inc1 \
    --reprob 0.25 --mixup 0.8 --cutmix 1.0 > run.log 2>&1
  cd - > /dev/null
fi
python "$HERE/record_digits_rows.py" --device tpu --commit \
  --run "new_family_digits_swin_tiny_e120=/tmp/digits_swin120" \
  --model swin_tiny \
  --recipe "scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + mixup/cutmix, input 224, seed 88, 120 epochs (4x the 30-epoch row)" \
  --note "clarifying rerun for the 28.5% 30-epoch row: transformer data-hunger on 1.5k images - that curve was still climbing at epoch 29; this run also exercises the round-5 merged attention layout in real training"
echo R5_SWIN_FOLLOWUPS_DONE
