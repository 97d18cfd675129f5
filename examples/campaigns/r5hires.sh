#!/bin/bash
# Round-5 training-time-resolution A/B (VERDICT r4 item 2).
#
# Identical recipe to examples/campaigns/r5tex.sh (warm start from the
# committed round-3 occ_best_bf16.npz, 30 cosine epochs @ 1e-4, batch
# 16, min-visibility 0.8) — the ONLY change is the data: the 480x640
# re-renders of the same textured-settled scene distribution
# (train_tex_hires_s44000, same seed 44000), validated in-loop on the
# 480x640 re-render of the frozen val scenes (val_tex_hires_packed,
# fingerprint-verified as a superset sequence of the 862-crop val).
# Crops pack at 256x256 in both runs; hires sources mean the object
# crops keep native detail instead of being upsampled from 240x320
# (the one training-side factor VERDICT r4 §1b left untested;
# reference renders at 480x640:
# /root/reference/morefusion/datasets/ycb_video/dataset.py:83-104).
#
# Compare at matched epochs against r5tex's log (same cosine horizon,
# so equal-epoch points share the LR schedule position).
#
# Runs concurrently with r5tex on the one chip: eval every 0.5 epoch
# (comparison points still align with r5tex's 0.25 grid) and a lower
# RSS exit so the two trainers fit in host RAM together.
#
# Usage: bash examples/campaigns/r5hires.sh [RUN_DIR] [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5hires}"
EPOCHS="${2:-30}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"

while [ ! -f "$DATA/train_tex_hires_s44000_packed/scalars.npz" ]; do
  echo "[campaign] waiting for $DATA/train_tex_hires_s44000_packed ..."
  sleep 60
done

while true; do
  python examples/train.py \
    --out "$RUN" \
    --data "$DATA/train_tex_hires_s44000_packed" \
    --val-data "$DATA/val_tex_hires_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 1e-4 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.5 --rss-exit-gb 28 \
    --resume --pretrained-model docs/results/occ_best_bf16.npz
  code=$?
  if [ "$code" -eq 42 ]; then
    echo "[campaign] RSS exit; relaunching with --resume"
    continue
  fi
  if [ "$code" -eq 0 ]; then
    echo "[campaign] training complete"
    exit 0
  fi
  RETRIES="${RETRIES:-0}"
  RETRIES=$((RETRIES + 1))
  if [ "$RETRIES" -gt 30 ]; then
    echo "[campaign] giving up after $RETRIES failures"
    exit $code
  fi
  echo "[campaign] train.py exited $code; retry $RETRIES in 120s"
  sleep 120
done
