#!/usr/bin/env python
"""Bank training-campaign checkpoints into git the moment they improve.

Lesson of rounds 3-4 (seven VM wipes): every round-4 headline checkpoint
(r4ft 0.4786, r4s2 0.4802, r4tex 0.5793) was destroyed because the bf16
npz was only exported at campaign end. This watcher closes that hole:

- polls ``<run-dir>/log.json`` for the best ``main/add_or_add_s/auc``;
- whenever it improves by >= --min-delta over the last banked value,
  copies ``snapshot_model_best_validation_main_auc.npz`` (now written by
  ``CheckpointManager.save_best`` on every improvement) to
  ``docs/results/<tag>_best_bf16.npz`` plus ``<tag>_log.json`` /
  ``<tag>_args.json``, and commits all three;
- exits when the supervised PID is gone and no newer rows appear.

Role parallel in the reference: Chainer's snapshot extensions
(``examples/ycb_video/singleview_3d/train.py:434-461``) — extended with
the wipe-survival git step this environment demands.

Usage:
  python examples/campaign_guardian.py --run-dir /root/runs/tex \
      --tag r5tex --pid 12345 &
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
RESULTS = os.path.join(REPO, "docs", "results")


def best_val_auc(run_dir):
    path = os.path.join(run_dir, "log.json")
    if not os.path.exists(path):
        return None, None
    try:
        rows = json.load(open(path))
    except (json.JSONDecodeError, OSError):
        return None, None
    best, best_row = None, None
    for r in rows:
        v = r.get("main/add_or_add_s/auc")
        if v is not None and (best is None or v > best):
            best, best_row = v, r
    return best, best_row


def pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def bank(run_dir, tag, best, row):
    src = os.path.join(
        run_dir, "snapshot_model_best_validation_main_auc.npz"
    )
    if not os.path.exists(src):
        print(f"[guardian] best improved to {best:.4f} but {src} missing",
              flush=True)
        return False
    dst = os.path.join(RESULTS, f"{tag}_best_bf16.npz")
    shutil.copyfile(src, dst)
    for name in ("log.json", "args.json"):
        p = os.path.join(run_dir, name)
        if os.path.exists(p):
            shutil.copyfile(p, os.path.join(RESULTS, f"{tag}_{name}"))
    files = [
        os.path.join(RESULTS, f"{tag}_best_bf16.npz"),
        os.path.join(RESULTS, f"{tag}_log.json"),
        os.path.join(RESULTS, f"{tag}_args.json"),
    ]
    files = [f for f in files if os.path.exists(f)]
    msg = (
        f"{tag}: bank best checkpoint (val ADD(-S) AUC {best:.4f}, "
        f"epoch {row.get('epoch', -1):.1f})"
    )
    try:
        subprocess.run(["git", "add"] + files, cwd=REPO, check=True)
        r = subprocess.run(
            ["git", "commit", "-m", msg, "--only"] + files,
            cwd=REPO, capture_output=True, text=True,
        )
        print(f"[guardian] {msg}: commit rc={r.returncode}", flush=True)
        if r.returncode != 0:
            print(r.stdout + r.stderr, flush=True)
    except Exception as e:  # git failure must not kill the watcher
        print(f"[guardian] git failed: {e}", flush=True)
    return True


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--pid", type=int, default=None,
                    help="training PID; exit once it is gone")
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--min-delta", type=float, default=0.002,
                    help="bank only when best improves by this much "
                    "(keeps commit noise down; final bank on exit)")
    args = ap.parse_args()

    banked = None
    while True:
        best, row = best_val_auc(args.run_dir)
        if best is not None and (banked is None or best > banked + args.min_delta):
            if bank(args.run_dir, args.tag, best, row):
                banked = best
        if args.pid is not None and not pid_alive(args.pid):
            # final pass: bank any residual improvement, however small
            best, row = best_val_auc(args.run_dir)
            if best is not None and (banked is None or best > banked):
                bank(args.run_dir, args.tag, best, row)
            print("[guardian] training PID gone; exiting", flush=True)
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
