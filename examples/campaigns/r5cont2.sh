#!/bin/bash
# Round-5 continuation, take 2: triple fresh-data fine-tune.
#
# Same design as r5cont.sh (fresh-data fine-tune at the flattened end
# of the previous winner's curve) one rung up the ladder: warm start
# from the banked r5cont best and train on TRIPLE hires data — seeds
# 44000 + 45000 + the freshly generated 46000 (train.py multi-source
# --data, the reference's ConcatenatedDataset pattern,
# examples/ycb_video/singleview_3d/train.py:281-296). r5cont measured
# +0.015 AUC inside two epochs of its 2x-data schedule, so data
# freshness at the curve's flat end is a live lever; this continues it
# with another disjoint shard. Guardian banks every improvement as
# docs/results/r5cont2_best_bf16.npz.
#
# Waits for (a) the r5seg2 campaign to release the TPU, (b) the
# seed-46000 generation, then packs it and trains.
#
# Usage: bash examples/campaigns/r5cont2.sh [RUN_DIR] [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5cont2}"
EPOCHS="${2:-12}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"
# persistent XLA compile cache: relaunches (RSS exits, kills)
# skip the multi-minute train-step recompile
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache_train}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

while true; do
  [ -f /tmp/r5seg3_campaign.log ] \
    && grep -q "\[r5seg3\] done\|\[r5seg3\] giving up" \
         /tmp/r5seg3_campaign.log && break
  echo "[r5cont2] waiting for the r5seg3 campaign ..."
  sleep 120
done

while [ ! -f "$DATA/train_tex_hires_s46000_reindexed/meta.json" ]; do
  echo "[r5cont2] waiting for seed-46000 generation ..."
  sleep 120
done

if [ ! -f "$DATA/train_tex_hires_s46000_packed/scalars.npz" ]; then
  python -c "
from morefusion_tpu import datasets
datasets.packed.pack_reindexed(
    '$DATA/train_tex_hires_s46000_reindexed',
    '$DATA/train_tex_hires_s46000_packed')
"
fi

python examples/campaign_guardian.py --run-dir "$RUN" --tag r5cont2 \
  > /tmp/r5cont2_guardian.log 2>&1 &

RETRIES=0
while true; do
  python examples/train.py \
    --out "$RUN" \
    --data "$DATA/train_tex_hires_s44000_packed" \
           "$DATA/train_tex_hires_s45000_packed" \
           "$DATA/train_tex_hires_s46000_packed" \
    --val-data "$DATA/val_tex_hires_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 3e-5 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.25 --rss-exit-gb 80 \
    --resume --pretrained-model docs/results/r5cont_best_bf16.npz
  code=$?
  if [ "$code" -eq 42 ]; then
    echo "[r5cont2] RSS exit; relaunching with --resume"
    continue
  fi
  if [ "$code" -eq 0 ]; then
    echo "[r5cont2] training complete"
    exit 0
  fi
  RETRIES=$((RETRIES + 1))
  if [ "$RETRIES" -gt 30 ]; then
    echo "[r5cont2] giving up after $RETRIES failures"
    exit $code
  fi
  echo "[r5cont2] train.py exited $code; retry $RETRIES in 120s"
  sleep 120
done
