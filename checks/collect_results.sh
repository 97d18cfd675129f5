#!/bin/bash
# Copy round-3 campaign artifacts from /root/runs into docs/results/ so a
# VM wipe cannot destroy evidence again (see docs/ROUND3.md operations
# log). Idempotent; run it whenever a chain stage completes, then commit.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=$REPO/docs/results
mkdir -p "$OUT"

copy() { [ -e "$1" ] && cp -f "$1" "$OUT/$2" && echo "collected $2"; }

# stage markers (what finished, with mtimes)
[ -d /root/runs/markers ] && ls -la /root/runs/markers > "$OUT/chain_markers.txt"

# ablation sweep jsons + report table
for f in /root/runs/eval_*.json; do
  [ -e "$f" ] && cp -f "$f" "$OUT/" && echo "collected $(basename "$f")"
done
copy /root/runs/r3_ablation_table.txt r3_ablation_table.txt
copy /root/runs/r3_refine_table.json r3_refine_table.json
copy /root/runs/r3_replay_eval.json r3_replay_eval.json
copy /root/runs/r3_replay_eval_seg.json r3_replay_eval_seg.json
copy /root/runs/r3_pipeline_seg.json r3_pipeline_seg.json

# training curves (log.json is small; snapshots are not collected)
copy /root/runs/occ/log.json occ_log.json
copy /root/runs/occ/args.json occ_args.json
copy /root/runs/noocc/log.json noocc_log.json
copy /root/runs/noocc/args.json noocc_args.json
copy /root/runs/seg/metrics.json seg_metrics.json
copy /root/runs/seg/per_class.json seg_per_class.json

exit 0
