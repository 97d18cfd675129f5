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
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


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


_METRICS = (
    ("ADD(-S) AUC", "main/add_or_add_s/auc"),
    ("ADD-S AUC", "main/add_s/auc"),
    ("ADD(-S) <2cm", "main/add_or_add_s/<2cm"),
)


def _bootstrap(row_records, n_boot: int = 1000, seed: int = 0):
    """Paired bootstrap over the shared val crops.

    All variants score the SAME crop sequence (eval_sweep runs the val
    set with shuffle=False), so resampling one index vector per bootstrap
    draw and applying it to every variant yields paired CIs — the
    variance of the *difference* between variants excludes the shared
    crop-sampling noise that unpaired single-seed point estimates (the
    reference's protocol, docs/index.html:200-203) cannot separate.
    Returns {row_name: {metric_key: (n_boot,) array}}.
    """
    from morefusion_tpu.training import summarize_records

    names = list(row_records.keys())
    cls0 = np.asarray(row_records[names[0]]["class_id"])
    for name in names[1:]:
        if not np.array_equal(
            np.asarray(row_records[name]["class_id"]), cls0
        ):
            raise ValueError(
                "records are not aligned across variants; cannot pair"
            )
    adds = {
        name: {
            k: np.asarray(row_records[name][k])
            for k in ("add", "add_s", "add_or_add_s")
        }
        for name in names
    }
    n = len(cls0)
    rng = np.random.RandomState(seed)
    out = {
        name: {key: np.empty(n_boot) for _, key in _METRICS}
        for name in names
    }
    for b in range(n_boot):
        idx = rng.randint(0, n, n)
        cls_b = cls0[idx]
        for name in names:
            s = summarize_records(
                cls_b, {k: v[idx] for k, v in adds[name].items()}
            )
            for _, key in _METRICS:
                out[name][key][b] = s[key]
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--runs", required=True, help="dir with eval jsons")
    parser.add_argument("--occ-run", default="occ",
                        help="run name of the occupancy model")
    parser.add_argument("--noocc-run", default="noocc",
                        help="run name of the no-occupancy model")
    parser.add_argument("--n-boot", type=int, default=1000,
                        help="bootstrap draws (0 = point estimates only)")
    parser.add_argument("--easy-suffix", default="easyval_packed",
                        help="dataset-basename suffix of the easy-val "
                        "sweep files (see eval_sweep.py naming)")
    args = parser.parse_args()
    ROWS = rows_for(args.occ_run, args.noocc_run)

    print("| Variant | ADD(-S) AUC | ADD-S AUC | ADD(-S) <2cm |")
    print("|---|---|---|---|")
    row_records = {}
    for name, fname, method in ROWS:
        path = os.path.join(args.runs, fname)
        if not os.path.exists(path):
            print(f"| {name} | (missing: {fname}) | | |")
            continue
        with open(path) as f:
            blob = json.load(f)
        s = blob[method]
        recs = blob.get("records")
        if recs is not None and method in recs:  # evaluate.py layout
            recs = recs[method]
        if recs:
            row_records[name] = recs
        print(
            f"| {name} | {s['main/add_or_add_s/auc']:.4f} "
            f"| {s['main/add_s/auc']:.4f} "
            f"| {s['main/add_or_add_s/<2cm']:.4f} |"
        )

    # easy-val continuity rows (round-2 comparable: 3-6 objects/scene)
    easy = [
        ("MF-occ (easy val)",
         f"eval_{args.noocc_run}_observed_{args.easy_suffix}.json"),
        ("MF (easy val)",
         f"eval_{args.occ_run}_observed_{args.easy_suffix}.json"),
    ]
    easy = [(n, f) for n, f in easy
            if os.path.exists(os.path.join(args.runs, f))]
    easy_records = {}
    if easy:
        print()
        print("| Easy val (3-6 obj) | ADD(-S) AUC | ADD-S AUC "
              "| ADD(-S) <2cm |")
        print("|---|---|---|---|")
        for name, fname in easy:
            with open(os.path.join(args.runs, fname)) as f:
                blob = json.load(f)
            s = blob["morefusion"]
            if blob.get("records"):
                easy_records[name] = blob["records"]
            print(
                f"| {name} | {s['main/add_or_add_s/auc']:.4f} "
                f"| {s['main/add_s/auc']:.4f} "
                f"| {s['main/add_or_add_s/<2cm']:.4f} |"
            )

    def print_boot(records, title):
        boot = _bootstrap(records, n_boot=args.n_boot)
        names = list(boot.keys())
        base = names[0]  # MF-occ row
        print()
        print(
            f"{title} (n={args.n_boot}, 95% CI; "
            f"delta rows are vs `{base}` on identical crops):"
        )
        print("| Variant | " + " | ".join(m for m, _ in _METRICS) + " |")
        print("|---|" + "---|" * len(_METRICS))
        for name in names:
            cells = []
            for _, key in _METRICS:
                lo, hi = np.percentile(boot[name][key], [2.5, 97.5])
                cells.append(f"[{lo:.4f}, {hi:.4f}]")
            print(f"| {name} | " + " | ".join(cells) + " |")
        for name in names[1:]:
            cells = []
            for _, key in _METRICS:
                d = boot[name][key] - boot[base][key]
                lo, hi = np.percentile(d, [2.5, 97.5])
                sig = "*" if lo > 0 or hi < 0 else " "
                cells.append(f"{np.mean(d):+.4f} [{lo:+.4f}, {hi:+.4f}]{sig}")
            print(f"| delta {name} | " + " | ".join(cells) + " |")

    if args.n_boot and len(row_records) >= 2:
        print_boot(row_records, "Paired bootstrap")
    if args.n_boot and len(easy_records) >= 2:
        print_boot(easy_records, "Paired bootstrap, easy val")


if __name__ == "__main__":
    main()
