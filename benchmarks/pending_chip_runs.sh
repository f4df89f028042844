#!/bin/bash
# Round-4 chip work queue, in priority order (VERDICT r3 "Next round").
# Run serially on a healthy chip; each harness replaces its own
# results.json rows. NEVER kill a step mid-device-claim (that wedges the
# relay for every later claimant) — use generous timeouts from the start.
#
# SELF-RECORDING: every receipt is committed to git as soon as it lands, so
# the round keeps its receipts even if the session that launched the queue
# dies (round 4's relay wedge cost hours of session restarts).
set -x
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$HERE/.."

# dataset the digits runs expect (idempotent)
python -c "
import sys; sys.path.insert(0, '$HERE')
from realdata import build_digits_folder
build_digits_folder('/tmp/digits_ds')"

# 0. headline sweep — regenerates bench_sweep.json (the stale-fallback
#    source) and the driver line
BENCH_SWEEP=1 python "$REPO/bench.py" && \
  git -C "$REPO" add benchmarks/bench_sweep.json && \
  git -C "$REPO" commit -m "Regenerate chip bench sweep (round-4 reading)"

# 1. segmentation convergence receipt on chip (replaces the device=cpu row;
#    seg_receipt.py upserts its own results.json row)
python "$HERE/seg_receipt.py" --iters 300 --batch_size 16 --crop 64 \
  --device tpu && \
  git -C "$REPO" add benchmarks/results.json && \
  git -C "$REPO" commit -m "Segmentation convergence receipt on chip (seg_digits_upernet)"

# 2-3. digits convergence for the two newest families (same recipe as the
# committed mobilenet_v3_small / efficientnet_b0 rows; swin needs 224 input)
for M in "swin_tiny 224" "densenet121 64"; do
  set -- $M
  mkdir -p "/tmp/digits_$1" && cd "/tmp/digits_$1"
  python "$REPO/train.py" --data_path /tmp/digits_ds \
    --train_split_rato 0.85 --model "$1" --input_size "$2" --batch_size 128 \
    --epochs 30 --warmup_epochs 2 --seed 88 --pretrained false \
    --num_workers 8 --aa rand-m9-mstd0.5-inc1 --reprob 0.25 \
    --mixup 0.8 --cutmix 1.0 > run.log 2>&1
  cd - > /dev/null
  python "$HERE/record_digits_rows.py" --device tpu --commit \
    --run "new_family_digits_$1=/tmp/digits_$1" --model "$1" \
    --recipe "scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + mixup/cutmix, input $2, seed 88"
done

# 4. EMA horizon-matched RASampler rerun (r3 row left EMA -6.7 pts with
#    decay 0.9995 over ~260 updates; 0.99 has a ~69-update half-life —
#    matched to this run length). Row: c5_rasampler_digits_ema_matched.
# NOTE: if /tmp/digits_c5ema already holds a completed CPU run of this exact
# recipe (launched while the chip was wedged), record it instead of rerunning.
if ! grep -q '"epoch": 19' /tmp/digits_c5ema/train_cls/log.txt 2>/dev/null; then
  mkdir -p /tmp/digits_c5ema && cd /tmp/digits_c5ema
  python "$REPO/train.py" --data_path /tmp/digits_ds --train_split_rato 0.85 \
    --model resnet18 --input_size 64 --batch_size 128 --epochs 20 \
    --warmup_epochs 2 --seed 88 --pretrained false --RASampler true \
    --model_ema true --model_ema_decay 0.99 \
    --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --mixup 0.8 --cutmix 1.0 \
    > run.log 2>&1
  cd - > /dev/null
  C5EMA_DEVICE=tpu
else
  C5EMA_DEVICE=cpu
fi
python "$HERE/record_digits_rows.py" --device "${C5EMA_DEVICE:-tpu}" --commit \
  --run "c5_rasampler_digits_ema_matched=/tmp/digits_c5ema" --model resnet18 \
  --recipe "scratch, RASampler, EMA decay 0.99 (horizon-matched: ~69-update half-life vs ~260 updates), rand-m9 + reprob 0.25 + mixup/cutmix, input 64, seed 88" \
  --note "horizon-matched rerun of c5_rasampler_digits: decay 0.99 has a ~69-update half-life, so over this run's ~260 real updates only 0.99^260 = 7% of the init weights remain in the EMA (vs 88% at decay 0.9995) - the r2 'EMA within 2 pts of raw' bar applies here"

# 5. Swin decomposition + ViT bound + ResNet bwd bound (receipt instruments)
BENCH_MODEL=swin_tiny python "$HERE/profile_trace.py"
python "$HERE/bench_swin.py"
python "$HERE/bench_vit_bound.py"
python "$HERE/bench_resnet_bwd.py"
git -C "$REPO" add benchmarks/trace_ops_swin_tiny.json \
  benchmarks/swin_bench.json benchmarks/vit_bound.json \
  benchmarks/resnet_bwd_bound.json 2>/dev/null
git -C "$REPO" commit -m "Swin/ViT/ResNet chip decomposition + bound receipts"

# 6. per-family rebench of the models whose code changed this round
BENCH_MODELS=swin_tiny python "$REPO/bench.py" && \
  git -C "$REPO" add benchmarks/bench_models.json 2>/dev/null && \
  git -C "$REPO" commit -m "Rebench swin_tiny per-family row on chip"

echo PENDING_CHIP_RUNS_DONE
