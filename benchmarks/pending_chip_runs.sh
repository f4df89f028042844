#!/bin/bash
# Chip runs pending from round 3: the tunneled TPU's claim wedged mid-session
# (a killed mid-claim client left the relay-side grant stuck for >4h — see
# the verify skill's environment notes) and never recovered, so these three
# receipts were recorded on CPU or deferred. Run serially on a healthy chip;
# each harness replaces its own results.json rows.
set -x

# dataset the digits runs expect (idempotent)
python -c "
import sys; sys.path.insert(0, '$(dirname "$0")')
from realdata import build_digits_folder
build_digits_folder('/tmp/digits_ds')"

# 1. segmentation convergence receipt on chip (replaces the device=cpu row)
python "$(dirname "$0")/seg_receipt.py" --iters 300 --batch_size 16 --crop 64 \
  --device tpu

# 2-3. digits convergence for the two newest families (same recipe as the
# committed mobilenet_v3_small / efficientnet_b0 rows; swin needs 224 input)
for M in "swin_tiny 224" "densenet121 64"; do
  set -- $M
  mkdir -p "/tmp/digits_$1" && cd "/tmp/digits_$1"
  python "$(dirname "$0")/../train.py" --data_path /tmp/digits_ds \
    --train_split_rato 0.85 --model "$1" --input_size "$2" --batch_size 128 \
    --epochs 30 --warmup_epochs 2 --seed 88 --pretrained false \
    --num_workers 8 --aa rand-m9-mstd0.5-inc1 --reprob 0.25 \
    --mixup 0.8 --cutmix 1.0 > run.log 2>&1
  cd - > /dev/null
done
# record rows: benchmarks/convergence_digits.py documents the row format;
# best val top-1 comes from train_cls/log.txt of each run dir
echo PENDING_CHIP_RUNS_DONE
