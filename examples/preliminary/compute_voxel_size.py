#!/usr/bin/env python
"""Per-class voxel-size table (reference:
``examples/ycb_video/preliminary/compute_voxel_size.py``).

For every foreground class, reports the CAD bbox diagonal and the derived
voxel pitch ``diagonal / voxel_dim`` (the contract of
``YCBVideoModels.get_voxel_pitch``, reference
``morefusion/datasets/ycb_video/models.py:113-115``). Writes a CSV next to
the printed table so downstream configs can consume it.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import argparse
import csv
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--voxel-dim", type=int, default=32, help="grid resolution"
    )
    parser.add_argument("--out", default=None, help="optional CSV path")
    parser.add_argument(
        "--ycb-video",
        action="store_true",
        help="use the YCB-Video CAD bank (requires data on disk) instead "
        "of the zero-asset procedural models",
    )
    args = parser.parse_args()

    if args.ycb_video:
        from morefusion_tpu.datasets import YCBVideoModels

        models = YCBVideoModels()
    else:
        from morefusion_tpu.datasets import ProceduralModels

        models = ProceduralModels()

    rows = []
    for class_id in range(1, models.n_class):
        diagonal = models.get_bbox_diagonal(class_id)
        rows.append(
            dict(
                class_id=class_id,
                name=models.class_names[class_id],
                bbox_diagonal=round(float(diagonal), 6),
                voxel_size=round(float(diagonal) / args.voxel_dim, 6),
            )
        )

    w = max(len(r["name"]) for r in rows)
    print(f"{'id':>3} {'name':<{w}} {'bbox_diagonal':>14} {'voxel_size':>11}")
    for r in rows:
        print(
            f"{r['class_id']:>3} {r['name']:<{w}} "
            f"{r['bbox_diagonal']:>14.6f} {r['voxel_size']:>11.6f}"
        )

    if args.out:
        with open(args.out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
