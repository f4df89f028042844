#!/bin/bash
# Round-4 chip work queue, in priority order (VERDICT r3 "Next round").
# Run serially on a healthy chip; each harness replaces its own
# results.json rows. NEVER kill a step mid-device-claim (that wedges the
# relay for every later claimant) — use generous timeouts from the start.
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
BENCH_SWEEP=1 python "$REPO/bench.py"

# 1. segmentation convergence receipt on chip (replaces the device=cpu row)
python "$HERE/seg_receipt.py" --iters 300 --batch_size 16 --crop 64 \
  --device tpu

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
done

# 4. EMA horizon-matched RASampler rerun (r3 row left EMA -6.7 pts with
#    decay 0.9995 over ~260 updates; 0.99 has a ~69-update half-life —
#    matched to this run length). Row: c5_rasampler_digits_ema_matched.
mkdir -p /tmp/digits_c5ema && cd /tmp/digits_c5ema
python "$REPO/train.py" --data_path /tmp/digits_ds --train_split_rato 0.85 \
  --model resnet18 --input_size 64 --batch_size 128 --epochs 20 \
  --warmup_epochs 2 --seed 88 --pretrained false --RASampler true \
  --model_ema true --model_ema_decay 0.99 \
  --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --mixup 0.8 --cutmix 1.0 \
  > run.log 2>&1
cd - > /dev/null

# 5. Swin decomposition + ViT bound + ResNet bwd bound (receipt instruments)
BENCH_MODEL=swin_tiny python "$HERE/profile_trace.py"
python "$HERE/bench_swin.py"
python "$HERE/bench_vit_bound.py"
python "$HERE/bench_resnet_bwd.py"

# 6. per-family rebench of the models whose code changed this round
BENCH_MODELS=swin_tiny python "$REPO/bench.py"

# record rows: benchmarks/convergence_digits.py documents the row format;
# best val top-1 comes from train_cls/log.txt of each run dir
echo PENDING_CHIP_RUNS_DONE
