#!/usr/bin/env python
"""Visibility-stratified accuracy from a committed refinement artifact.

Bounds how much of the gap to the reference's published AUC is
*occlusion difficulty*: the campaign val keeps every crop (no
visibility filter, `docs/EVAL_PROTOCOL.md`), while heavy 8-14-object
clutter puts 16% of crops below 0.5 visibility. This script re-scores
the per-crop records of a refinement-table artifact
(`docs/results/r4_refine_table_joint.json`) against the packed val's
per-crop visibility — offline, no device needed.

AUC convention: committed tables report the MACRO average (mean of
per-class VOCap AUCs, the reference scoreboard convention); within
visibility strata the class support gets thin, so this report prints
POOLED (micro) AUC per stratum and labels it as such, plus the macro
number for the full set as the cross-check against the source table.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--artifact", default="docs/results/r4_refine_table_joint.json"
    )
    parser.add_argument("--val-packed", default="/root/data/val_packed")
    parser.add_argument(
        "--methods", nargs="+",
        default=["morefusion", "morefusion+icp"],
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import numpy as np

    from morefusion_tpu.datasets.ycb_video.class_names import (
        class_ids_symmetric,
    )
    from morefusion_tpu.metrics import ycb_video_add_auc
    from morefusion_tpu.training import summarize_records

    z = np.load(os.path.join(args.val_packed, "scalars.npz"))
    vis = z["visibility"]
    cid_packed = z["class_id"]

    with open(args.artifact) as f:
        blob = json.load(f)

    bins = [(0.0, 0.5), (0.5, 0.7), (0.7, 0.9), (0.9, 1.01)]
    report = {"artifact": args.artifact, "bins": {}, "methods": {}}
    for method in args.methods:
        rec = blob["records"][method]
        cids = np.asarray(rec["class_id"])
        assert (cids == cid_packed).all(), (
            "record order does not match the packed val index"
        )
        add = np.asarray(rec["add"])
        add_s = np.asarray(rec["add_s"])
        aos = np.where(
            np.isin(cids, list(class_ids_symmetric)), add_s, add
        )
        macro = summarize_records(
            cids, {"add_or_add_s": aos}
        )["main/add_or_add_s/auc"]
        rows = {}
        print(f"\n== {method}  (full-set macro AUC {macro:.4f}, "
              f"pooled {ycb_video_add_auc(aos):.4f})")
        for lo, hi in bins:
            m = (vis >= lo) & (vis < hi)
            if not m.sum():
                continue
            rows[f"[{lo:.1f},{hi:.1f})"] = dict(
                n=int(m.sum()),
                pooled_auc=float(ycb_video_add_auc(aos[m])),
                pooled_add_s_auc=float(ycb_video_add_auc(add_s[m])),
                lt_2cm=float((aos[m] < 0.02).mean()),
            )
            r = rows[f"[{lo:.1f},{hi:.1f})"]
            print(
                f"  vis [{lo:.1f},{hi:.1f}): n={r['n']:3d}  "
                f"ADD(-S) {r['pooled_auc']:.4f}  "
                f"ADD-S {r['pooled_add_s_auc']:.4f}  "
                f"<2cm {r['lt_2cm']:.3f}"
            )
        report["methods"][method] = dict(
            macro_auc=float(macro),
            pooled_auc=float(ycb_video_add_auc(aos)),
            strata=rows,
        )
    report["visibility_frac_below_05"] = float((vis < 0.5).mean())
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
