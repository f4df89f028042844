#!/bin/bash
# Layout convergence A/B at a stable LR. Context: the lr-1e-3 digits recipe
# is a knife-edge for swin-from-scratch — the pre-layout run barely escaped
# the uniform-logit plateau (train_loss bottomed at 2.28, 25-28% top-1) and
# the post-layout replica (same seed) did not, while a 5-step on-chip SGD
# probe shows merged/legacy gradients identical to 4 digits. At lr 5e-4 the
# regime should be stable for BOTH layouts; matching results here lock
# convergence-neutrality of the merged layout with a receipt.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HERE="$REPO/benchmarks"

run_one() {  # run_one <tag> <layout>
  local dir="/tmp/digits_swin_lr5e4_$1"
  if ! grep -q '"epoch": 29' "$dir/train_cls/log.txt" 2>/dev/null; then
    mkdir -p "$dir" && cd "$dir"
    python "$REPO/train.py" --data_path /tmp/digits_ds \
      --train_split_rato 0.85 --model swin_tiny --input_size 224 \
      --batch_size 128 --epochs 30 --warmup_epochs 2 --seed 88 --lr 5e-4 \
      --swin_attn_layout "$2" --pretrained false --num_workers 8 \
      --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --mixup 0.8 --cutmix 1.0 \
      > run.log 2>&1
    cd - > /dev/null
  fi
  python "$HERE/record_digits_rows.py" --device tpu --commit \
    --run "swin_tiny_lr5e4_$1=$dir" --model swin_tiny \
    --recipe "scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + mixup/cutmix, input 224, seed 88, 30 epochs, lr 5e-4, attn_layout=$2" \
    --note "layout convergence A/B at stable LR (see script header): the lr-1e-3 recipe is a knife-edge for swin-from-scratch on 1.5k images"
}

run_one merged merged
run_one legacy legacy
echo R5_SWIN_LR_AB_DONE
