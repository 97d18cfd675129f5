#!/usr/bin/env python
"""Generate a synthetic reindexed training set (no external data needed).

Equivalent of the reference's two-stage data path
(``examples/ycb_video/synthetic_data/generate_data.py`` +
``datasets/rgbd_pose_estimation/reindex.py``): physics-free cluttered
scenes -> rendered frames -> per-instance npz examples + meta.json.

Usage:
  python examples/synthetic/generate_data.py --out /tmp/mftpu_data \
      --n-frames 200 --n-workers 4
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../..")
)
import argparse


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--out", required=True, help="output root dir")
    parser.add_argument("--split", default="train", choices=["train", "val"])
    parser.add_argument("--n-frames", type=int, default=200)
    parser.add_argument("--n-objects", type=int, nargs=2, default=(3, 6))
    parser.add_argument("--image-shape", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-workers", type=int, default=1)
    parser.add_argument(
        "--settle", default="physics", choices=["physics", "drop"],
        help="physics: quasi-static settled resting poses (round-4 "
        "training data); drop: legacy plane drop, bit-exact "
        "reproduction of the frozen campaign val (EVAL_PROTOCOL.md)",
    )
    parser.add_argument(
        "--textured", action="store_true",
        help="procedurally textured model bank (checker + label patch "
        "in canonical coordinates) - the zero-egress analogue of the "
        "reference's textured YCB meshes; scene content for a given "
        "seed is identical to the untextured render",
    )
    args = parser.parse_args()

    from morefusion_tpu import datasets

    ds = datasets.SyntheticRGBDPoseEstimationDataset(
        split=args.split,
        models=datasets.ProceduralModels(textured=True)
        if args.textured
        else None,
        n_frames=args.n_frames,
        n_objects=tuple(args.n_objects),
        seed=args.seed,
        image_shape=tuple(args.image_shape),
        settle=args.settle,
    )
    meta = datasets.reindex(args.out, [ds], n_workers=args.n_workers)
    print(f"wrote {len(meta)} instance examples to {args.out}")


if __name__ == "__main__":
    main()
