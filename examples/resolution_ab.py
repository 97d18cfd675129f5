#!/usr/bin/env python
"""Training-time-resolution A/B table (VERDICT r4 item 2).

Pairs the r5tex (240x320 sources) and r5hires (480x640 sources)
validation curves at matched epochs — identical recipe, warm start,
seed, scene distribution and cosine horizon; the only difference is the
render resolution of the training/val sources (the factor
`docs/ROUND4.md` §1b left untested on the training side; the reference
renders at 480x640, ``morefusion/datasets/ycb_video/dataset.py:83-104``).
Emits a JSON artifact with the matched-epoch series and the best row of
each run.

Usage:
  python examples/resolution_ab.py --a /root/runs/r5tex \
      --b /root/runs/r5hires --out docs/results/r5_resolution_ab.json
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

KEY = "main/add_or_add_s/auc"  # in-loop validation rows (no train loss)


def val_series(run_dir):
    rows = json.load(open(os.path.join(run_dir, "log.json")))
    out = {}
    for r in rows:
        if KEY in r:
            # snap to the 0.5-epoch grid: RSS-exit resumes shift eval
            # points by a fraction of an epoch (23.21 vs 23.25)
            out[round(2.0 * float(r["epoch"])) / 2.0] = float(r[KEY])
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--a", required=True, help="240x320-source run dir")
    p.add_argument("--b", required=True, help="480x640-source run dir")
    p.add_argument("--a-name", default="r5tex_240x320")
    p.add_argument("--b-name", default="r5hires_480x640")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    a, b = val_series(args.a), val_series(args.b)
    shared = sorted(set(a) & set(b))
    table = [
        dict(epoch=e, **{args.a_name: a[e], args.b_name: b[e],
                         "delta": b[e] - a[e]})
        for e in shared
    ]
    best_a = max(a.items(), key=lambda kv: kv[1])
    best_b = max(b.items(), key=lambda kv: kv[1])
    rec = {
        "metric": KEY,
        "matched_epochs": table,
        "best": {
            args.a_name: dict(epoch=best_a[0], auc=best_a[1]),
            args.b_name: dict(epoch=best_b[0], auc=best_b[1]),
            "delta": best_b[1] - best_a[1],
        },
        "mean_delta_matched": (
            sum(r["delta"] for r in table) / len(table) if table else None
        ),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec["best"], indent=1))
    print(f"matched epochs: {len(table)}, "
          f"mean delta {rec['mean_delta_matched']:+.4f}")


if __name__ == "__main__":
    main()
