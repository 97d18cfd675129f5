#!/usr/bin/env python
"""Occupancy-ablation report: the reference's core claim, on our data.

Reference scoreboard (``docs/index.html:200-203``): on Cluttered-YCB the
occupancy-aware model beats the occupancy-free one, and improves further
as the occupancy grids get more complete (noisy maps -> full nontarget
CAD grids -> full grids incl. background). This script assembles the same
4-row table from our runs:

- MF-occ:       train/eval without the occupancy branch
  (``examples/train.py --loss add/add_s``)
- MF:           occupancy model, observed (mapped, noisy) grids at eval
- MF+target-:   occupancy model, full nontarget CAD grids at eval
- MF+target-+bg: occupancy model, ``~grid_target_full`` at eval

Usage::

  python examples/ablation_report.py --runs /root/runs
"""

import argparse
import json
import os

def rows_for(occ_run: str, noocc_run: str):
    return (
        ("MF-occ (no occupancy)", f"eval_{noocc_run}_observed.json",
         "morefusion"),
        ("MF (observed grids)", f"eval_{occ_run}_observed.json",
         "morefusion"),
        ("MF+target- (full nontarget)",
         f"eval_{occ_run}_nontarget_full.json", "morefusion"),
        ("MF+target-+bg (full grids)", f"eval_{occ_run}_full_bg.json",
         "morefusion"),
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--runs", required=True, help="dir with eval jsons")
    parser.add_argument("--occ-run", default="occ2",
                        help="run name of the occupancy model")
    parser.add_argument("--noocc-run", default="noocc",
                        help="run name of the no-occupancy model")
    args = parser.parse_args()
    ROWS = rows_for(args.occ_run, args.noocc_run)

    print("| Variant | ADD(-S) AUC | ADD-S AUC | ADD(-S) <2cm |")
    print("|---|---|---|---|")
    for name, fname, method in ROWS:
        path = os.path.join(args.runs, fname)
        if not os.path.exists(path):
            print(f"| {name} | (missing: {fname}) | | |")
            continue
        with open(path) as f:
            s = json.load(f)[method]
        print(
            f"| {name} | {s['main/add_or_add_s/auc']:.4f} "
            f"| {s['main/add_s/auc']:.4f} "
            f"| {s['main/add_or_add_s/<2cm']:.4f} |"
        )


if __name__ == "__main__":
    main()
