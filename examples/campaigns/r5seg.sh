#!/bin/bash
# Round-5 segmentation retrain + instancing-merge A/B (VERDICT r4 item 5).
#
# Recipe = round 4's (train_segmentation.py --use-depth --steps 5000
# --n-frames 800, docs/ROUND4.md item 6) with the round-5
# merge_occlusion_splits fix active at instancing time; after training,
# the SAME weights are re-evaluated with --eval-only --no-merge so the
# detection/precision delta attributable to the merge heuristic is an
# exact same-weights A/B (per_class.json vs per_class_nomerge.json).
#
# Waits for the r5tex/r5hires accuracy campaigns to release the TPU
# (they are the round's priority). Frames come from the MFTPU_SEG_CACHE
# disk cache, pre-generated CPU-side while the campaigns train.
#
# Usage: bash examples/campaigns/r5seg.sh [RUN_DIR]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
RUN="${1:-/root/runs/r5seg}"
cd "$REPO"

wait_done() {  # block until a campaign log says training complete
  local log="$1"
  while true; do
    [ -f "$log" ] && grep -q "training complete\|giving up" "$log" && return
    echo "[r5seg] waiting for $log ..."
    sleep 120
  done
}
wait_done /tmp/r5tex_campaign.log
wait_done /tmp/r5hires_campaign.log

RETRIES=0
while true; do
  python examples/train_segmentation.py \
    --out "$RUN" --use-depth --steps 5000 --n-frames 800 \
    --n-val-frames 50 --n-objects 4 10 --seed 0 && break
  RETRIES=$((RETRIES + 1))
  [ "$RETRIES" -gt 10 ] && { echo "[r5seg] giving up"; exit 1; }
  echo "[r5seg] train exited nonzero; retry $RETRIES in 120s"
  sleep 120
done

# same-weights ablation: merge heuristic off
python examples/train_segmentation.py \
  --out "$RUN" --use-depth --steps 5000 --n-frames 800 \
  --n-val-frames 50 --n-objects 4 10 --seed 0 \
  --eval-only --no-merge

cp "$RUN/per_class.json" docs/results/r5_seg_per_class.json
cp "$RUN/per_class_nomerge.json" docs/results/r5_seg_per_class_nomerge.json
git add docs/results/r5_seg_per_class.json \
        docs/results/r5_seg_per_class_nomerge.json
git commit -m "r5seg: retrain + instancing-merge A/B per-class tables"
echo "[r5seg] done"
