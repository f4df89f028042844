#!/bin/bash
# Round-5 queue resume: the launching session died mid-step-5 (after the
# ViT bound receipt, during bench_resnet_bwd.py stage 3/4). This re-runs
# only the remaining steps of pending_chip_runs.sh and then writes the
# done marker. Same single-runner guard as the full queue.
set -x
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$HERE/.."

if [ -f /tmp/pending_chip_runs.done ]; then
  echo "queue already completed ($(cat /tmp/pending_chip_runs.done)) — exiting"
  exit 0
fi
exec 9>/tmp/pending_chip_runs.lock
if ! flock -n 9; then
  echo "another queue run holds the lock — exiting"
  exit 0
fi

commit_receipt() {  # commit_receipt <message> <file...> — skips missing files
  local msg="$1"; shift
  local staged=0
  for f in "$@"; do
    if [ -f "$REPO/$f" ]; then git -C "$REPO" add "$f" && staged=1; fi
  done
  [ "$staged" = 1 ] && git -C "$REPO" commit -m "$msg" || true
}

# 5 (tail). ResNet bwd bound — the partial JSON on disk has stages 1-2 only;
# the instrument rewrites the file from scratch, so just rerun it.
python "$HERE/bench_resnet_bwd.py" && \
  commit_receipt "ResNet-50 backward-bound receipt on chip" \
    benchmarks/resnet_bwd_bound.json

# 6. per-family rebench of the model whose code changed since its row
BENCH_MODELS=swin_tiny python "$REPO/bench.py" && \
  commit_receipt "Rebench swin_tiny per-family row on chip" \
    benchmarks/bench_models.json

echo "$(date -u)" > /tmp/pending_chip_runs.done
echo PENDING_CHIP_RUNS_DONE
