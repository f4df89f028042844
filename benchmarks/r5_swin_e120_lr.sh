#!/bin/bash
# Horizon-corrected 120-epoch swin_tiny run: the plain e120 rerun collapsed
# into the uniform-logit attractor (results.json new_family_digits_swin_tiny_e120,
# best 15.9) because a 4x-longer cosine holds LR >= 0.5 peak for 60 epochs on
# a 1.5k-image dataset. Classic small-data transformer LR-horizon scaling:
# halve the peak LR for the long horizon.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HERE="$REPO/benchmarks"

if ! grep -q '"epoch": 119' /tmp/digits_swin120lr/train_cls/log.txt 2>/dev/null
then
  mkdir -p /tmp/digits_swin120lr && cd /tmp/digits_swin120lr
  python "$REPO/train.py" --data_path /tmp/digits_ds \
    --train_split_rato 0.85 --model swin_tiny --input_size 224 \
    --batch_size 128 --epochs 120 --warmup_epochs 5 --seed 88 --lr 5e-4 \
    --pretrained false --num_workers 8 --aa rand-m9-mstd0.5-inc1 \
    --reprob 0.25 --mixup 0.8 --cutmix 1.0 > run.log 2>&1
  cd - > /dev/null
fi
python "$HERE/record_digits_rows.py" --device tpu --commit \
  --run "new_family_digits_swin_tiny_e120_lr5e4=/tmp/digits_swin120lr" \
  --model swin_tiny \
  --recipe "scratch, rand-m9-mstd0.5-inc1 + reprob 0.25 + mixup/cutmix, input 224, seed 88, 120 epochs, lr 5e-4 (peak halved for the 4x horizon)" \
  --note "horizon-corrected long run for the swin family: the lr-1e-3 e120 rerun collapsed into the uniform-logit attractor (its row carries the forensics); halving peak LR restores the escape the 30-epoch schedule gets from its faster cosine decay"
echo R5_SWIN_E120LR_DONE
