#!/bin/bash
# Round-5 backbone-init A/B (VERDICT r4 item 3): self-supervised warm
# start vs random init, same recipe/budget, frozen hires val.
#
# ImageNet init is environment-impossible (zero egress, re-verified
# round 4); the substitute is RotNet pretraining on the procedural
# textured renders (examples/pretrain_backbone.py). Two from-scratch
# arms isolate the init: identical data/recipe/seed/budget, one grafts
# the pretrained resnet_extractor subtree (--pretrained-backbone).
# From-scratch arms (NOT warm-started from a banked checkpoint) because
# the backbone init only matters when the backbone is otherwise random.
#
# Reference role: morefusion/models/resnet.py:7-52 (pretrained,
# frozen-BN ResNet18 under the reference recipe).
#
# Waits for the r5seg2 campaign to release the TPU (r5cont2 runs after
# this — its seed-46000 data generation is the long pole, so this
# shorter A/B fills the gap).
#
# Usage: bash examples/campaigns/r5ssl.sh [EPOCHS]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
EPOCHS="${1:-6}"
DATA="${MFTPU_DATA:-/root/data}"
cd "$REPO"
# persistent XLA compile cache: relaunches (RSS exits, kills)
# skip the multi-minute train-step recompile
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache_train}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

while true; do
  [ -f /tmp/r5seg2_campaign.log ] \
    && grep -q "\[r5seg2\] done\|\[r5seg2\] giving up" \
         /tmp/r5seg2_campaign.log && break
  echo "[r5ssl] waiting for the r5seg2 campaign ..."
  sleep 120
done

if [ ! -f /root/runs/r5ssl_pre/backbone_bf16.npz ]; then
  python examples/pretrain_backbone.py \
    --out /root/runs/r5ssl_pre \
    --data "$DATA/train_tex_hires_s44000_packed" \
           "$DATA/train_tex_hires_s45000_packed" \
    --steps 3000 --batch-size 64 --lr 3e-4 --seed 0 \
    || { echo "[r5ssl] pretrain failed"; exit 1; }
fi

run_arm() {  # run_arm NAME [extra train.py args...]
  local name="$1"; shift
  python examples/train.py \
    --out "/root/runs/$name" \
    --data "$DATA/train_tex_hires_s44000_packed" \
    --val-data "$DATA/val_tex_hires_packed" \
    --model singleview_3d --with-occupancy --loss add/add_s \
    --min-visibility 0.8 --batch-size 16 --epochs "$EPOCHS" \
    --lr 1e-4 --lr-schedule cosine --warmup-steps 200 --seed 0 \
    --eval-interval 0.25 --rss-exit-gb 80 --resume "$@"
  local code=$?
  if [ "$code" -eq 42 ]; then
    echo "[r5ssl] $name RSS exit; relaunching with --resume"
    run_arm "$name" "$@"
  fi
}

run_arm r5ssl_rand
run_arm r5ssl_init --pretrained-backbone /root/runs/r5ssl_pre/backbone_bf16.npz

python - <<'EOF'
import json, os

def best(run):
    log = json.load(open(f"/root/runs/{run}/log.json"))
    pts = [
        (e["validation/main/add_or_add_s/auc"], e["epoch"])
        for e in log
        if "validation/main/add_or_add_s/auc" in e
    ]
    return {
        "best_auc": max(pts)[0] if pts else None,
        "best_epoch": max(pts)[1] if pts else None,
        "curve": pts,
    }

pre = [json.loads(l) for l in open("/root/runs/r5ssl_pre/log.jsonl")]
out = {
    "protocol": "from-scratch A/B, train_tex_hires_s44000, frozen hires "
                "val, identical recipe/seed; arms differ only in "
                "--pretrained-backbone",
    "pretext_val_acc": pre[-1]["val_acc"] if pre else None,
    "random_init": best("r5ssl_rand"),
    "ssl_init": best("r5ssl_init"),
}
path = "docs/results/r5_ssl_ab.json"
json.dump(out, open(path, "w"), indent=1)
print("[r5ssl] wrote", path, {k: out[k] for k in ("pretext_val_acc",)},
      out["random_init"]["best_auc"], out["ssl_init"]["best_auc"])
EOF
git add docs/results/r5_ssl_ab.json
git commit -m "r5ssl: backbone-init A/B artifact (RotNet SSL vs random init)"
echo "[r5ssl] done"
