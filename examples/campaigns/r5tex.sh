#!/bin/bash
# Round-5 textured accuracy campaign (VERDICT r4 item 1).
#
# Exact recipe of docs/results/r5tex_args.json (the run the eighth VM
# wipe killed at epoch 1.5/30): warm start from the committed round-3
# occ_best_bf16.npz, 30 cosine epochs @ 1e-4 on the textured-settled
# seed-44000 train set, in-loop eval on the frozen textured 862-crop
# val every 0.25 epoch.  Survives host-RSS leak (TPU relay, ~3 MB/step)
# by exiting at 80 GB (code 42) and relaunching with --resume; the
# campaign guardian banks every improved checkpoint straight into git.
#
# Usage: bash examples/campaigns/r5tex.sh [RUN_DIR] [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5tex}"
EPOCHS="${2:-30}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"

# Wait for the packed train store (regen_datasets.py may still be running).
while [ ! -f "$DATA/train_tex_s44000_packed/scalars.npz" ]; do
  echo "[campaign] waiting for $DATA/train_tex_s44000_packed ..."
  sleep 60
done

while true; do
  python examples/train.py \
    --out "$RUN" \
    --data "$DATA/train_tex_s44000_packed" \
    --val-data "$DATA/val_tex_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 1e-4 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.25 --rss-exit-gb 80 \
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
  # Transient failures (TPU relay wedge, another process holding the
  # chip) retry with backoff instead of killing the campaign; --resume
  # picks up from the latest trainer snapshot.
  RETRIES="${RETRIES:-0}"
  RETRIES=$((RETRIES + 1))
  if [ "$RETRIES" -gt 30 ]; then
    echo "[campaign] giving up after $RETRIES failures"
    exit $code
  fi
  echo "[campaign] train.py exited $code; retry $RETRIES in 120s"
  sleep 120
done
