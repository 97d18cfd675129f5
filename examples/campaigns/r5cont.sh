#!/bin/bash
# Round-5 continuation: fresh-data fine-tune of the hires winner.
#
# Warm start from the banked r5hires best (docs/results/
# r5hires_best_bf16.npz) and train on DOUBLE hires data — the original
# seed-44000 set concatenated with a freshly generated seed-45000 set
# (train.py's multi-source --data, the reference's ConcatenatedDataset
# pattern, examples/ycb_video/singleview_3d/train.py:281-296) — on a
# short cosine cycle at a lower peak LR. Rationale: round-4 measured 2x
# data as a wash at low-res/untextured from scratch; this re-tests data
# scaling where it is most likely to bite — hires + textured, from a
# strong (0.63 AUC) warm start whose curve had flattened.
#
# Waits for (a) the r5hires campaign to finish, (b) the seed-45000
# reindexed generation, then packs it and trains. Guardian banks every
# improvement as docs/results/r5cont_best_bf16.npz.
#
# Usage: bash examples/campaigns/r5cont.sh [RUN_DIR] [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5cont}"
EPOCHS="${2:-12}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"

while ! grep -q "training complete\|giving up" /tmp/r5hires_campaign.log \
    2>/dev/null; do
  echo "[r5cont] waiting for the r5hires campaign ..."
  sleep 120
done

while [ ! -f "$DATA/train_tex_hires_s45000_reindexed/meta.json" ]; do
  echo "[r5cont] waiting for seed-45000 generation ..."
  sleep 120
done

if [ ! -f "$DATA/train_tex_hires_s45000_packed/scalars.npz" ]; then
  python -c "
from morefusion_tpu import datasets
datasets.packed.pack_reindexed(
    '$DATA/train_tex_hires_s45000_reindexed',
    '$DATA/train_tex_hires_s45000_packed')
"
fi

python examples/campaign_guardian.py --run-dir "$RUN" --tag r5cont \
  > /tmp/r5cont_guardian.log 2>&1 &

RETRIES=0
while true; do
  python examples/train.py \
    --out "$RUN" \
    --data "$DATA/train_tex_hires_s44000_packed" \
           "$DATA/train_tex_hires_s45000_packed" \
    --val-data "$DATA/val_tex_hires_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 3e-5 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.25 --rss-exit-gb 80 \
    --resume --pretrained-model docs/results/r5hires_best_bf16.npz
  code=$?
  if [ "$code" -eq 42 ]; then
    echo "[r5cont] RSS exit; relaunching with --resume"
    continue
  fi
  if [ "$code" -eq 0 ]; then
    echo "[r5cont] training complete"
    exit 0
  fi
  RETRIES=$((RETRIES + 1))
  if [ "$RETRIES" -gt 30 ]; then
    echo "[r5cont] giving up after $RETRIES failures"
    exit $code
  fi
  echo "[r5cont] train.py exited $code; retry $RETRIES in 120s"
  sleep 120
done
