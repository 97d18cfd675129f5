#!/bin/bash
# Round-5 continuation, take 3: quadruple fresh-data fine-tune.
#
# Next rung of the fresh-data ladder (r5cont +0.038, r5cont2 pending):
# warm start from the banked r5cont2 best (falling back to the r5cont
# best if cont2 never improved) and fine-tune on QUADRUPLE hires data —
# seeds 44000-47000. Guardian banks every improvement as
# docs/results/r5cont3_best_bf16.npz.
#
# Waits for (a) the r5cont2 campaign to release the TPU, (b) the
# seed-47000 generation chained after seed-46000.
#
# Usage: bash examples/campaigns/r5cont3.sh [RUN_DIR] [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5cont3}"
EPOCHS="${2:-10}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"
# persistent XLA compile cache: relaunches (RSS exits, kills)
# skip the multi-minute train-step recompile
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache_train}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

while true; do
  [ -f /tmp/r5cont2_campaign.log ] \
    && grep -q "training complete\|giving up" /tmp/r5cont2_campaign.log \
    && break
  echo "[r5cont3] waiting for the r5cont2 campaign ..."
  sleep 120
done

while [ ! -f "$DATA/train_tex_hires_s47000_reindexed/meta.json" ]; do
  echo "[r5cont3] waiting for seed-47000 generation ..."
  sleep 120
done

if [ ! -f "$DATA/train_tex_hires_s47000_packed/scalars.npz" ]; then
  python -c "
from morefusion_tpu import datasets
datasets.packed.pack_reindexed(
    '$DATA/train_tex_hires_s47000_reindexed',
    '$DATA/train_tex_hires_s47000_packed')
"
fi

WARM=docs/results/r5cont2_best_bf16.npz
[ -f "$WARM" ] || WARM=docs/results/r5cont_best_bf16.npz

python examples/campaign_guardian.py --run-dir "$RUN" --tag r5cont3 \
  > /tmp/r5cont3_guardian.log 2>&1 &

RETRIES=0
while true; do
  python examples/train.py \
    --out "$RUN" \
    --data "$DATA/train_tex_hires_s44000_packed" \
           "$DATA/train_tex_hires_s45000_packed" \
           "$DATA/train_tex_hires_s46000_packed" \
           "$DATA/train_tex_hires_s47000_packed" \
    --val-data "$DATA/val_tex_hires_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 3e-5 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.25 --rss-exit-gb 80 \
    --resume --pretrained-model "$WARM"
  code=$?
  if [ "$code" -eq 42 ]; then
    echo "[r5cont3] RSS exit; relaunching with --resume"
    continue
  fi
  if [ "$code" -eq 0 ]; then
    echo "[r5cont3] training complete"
    exit 0
  fi
  RETRIES=$((RETRIES + 1))
  if [ "$RETRIES" -gt 30 ]; then
    echo "[r5cont3] giving up after $RETRIES failures"
    exit $code
  fi
  echo "[r5cont3] train.py exited $code; retry $RETRIES in 120s"
  sleep 120
done
