#!/bin/bash
# Convergence A/B for the round-5 merged attention layout: EXACT replica of
# the committed 30-epoch swin_tiny receipt (new_family_digits_swin_tiny,
# recorded pre-layout-change at 28.5%), re-run under the merged layout.
# Convergence-neutral layout ⇒ ≈ same top-1.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HERE="$REPO/benchmarks"

if ! grep -q '"epoch": 29' /tmp/digits_swin30b/train_cls/log.txt 2>/dev/null
then
  mkdir -p /tmp/digits_swin30b && cd /tmp/digits_swin30b
  python "$REPO/train.py" --data_path /tmp/digits_ds \
    --train_split_rato 0.85 --model swin_tiny --input_size 224 \
    --batch_size 128 --epochs 30 --warmup_epochs 2 --seed 88 \
    --pretrained false --num_workers 8 --aa rand-m9-mstd0.5-inc1 \
    --reprob 0.25 --mixup 0.8 --cutmix 1.0 > run.log 2>&1
  cd - > /dev/null
fi
python "$HERE/record_digits_rows.py" --device tpu --commit \
  --run "new_family_digits_swin_tiny_merged_layout_ab=/tmp/digits_swin30b" \
  --model swin_tiny \
  --recipe "scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + mixup/cutmix, input 224, seed 88, 30 epochs - exact replica of new_family_digits_swin_tiny" \
  --note "convergence A/B for the round-5 merged window-attention layout: identical recipe/seed as the pre-change 28.5% receipt; layout is bit-equal in f32 and grad-identical at block level in bf16, so this locks convergence-neutrality end-to-end"
echo R5_SWIN_AB_DONE
