#!/usr/bin/env python
"""Multi-instance point-cloud ICP study (reference:
``examples/ycb_video/preliminary/align_pointclouds.py`` + ``icp.py``).

Generates a cluttered synthetic frame, initializes every instance's pose
at the centroid of its masked depth points (the reference's
``MultiInstanceICPRegistration`` init), runs scan-compiled ICP per
instance, and reports ADD before/after against ground truth.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import argparse

import numpy as np

from morefusion_tpu import geometry, metrics
from morefusion_tpu.contrib import ICPRegistration
from morefusion_tpu.datasets.rgbd_pose_estimation.synthetic import (
    SyntheticRGBDPoseEstimationDataset,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    ds = SyntheticRGBDPoseEstimationDataset(seed=args.seed)
    frame = ds.get_frame(args.frame)
    models = ds.models

    K = frame["intrinsic_matrix"]
    pcd = geometry.pointcloud_from_depth(
        frame["depth"], fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2]
    )
    nonnan = ~np.isnan(pcd).any(axis=2)

    print(f"{'instance':>8} {'class':>5} {'ADD init':>10} {'ADD icp':>10}")
    adds_init, adds_icp = [], []
    for i, instance_id in enumerate(frame["instance_ids"]):
        class_id = int(frame["class_ids"][i])
        T_true = frame["Ts_cad2cam"][i]
        mask = (frame["instance_label"] == instance_id) & nonnan
        if mask.sum() < 30:
            continue
        pcd_depth = pcd[mask].astype(np.float32)
        pcd_cad = models.get_pcd(class_id).astype(np.float32)

        # centroid init (reference align_pointclouds.py:44-49)
        T_init = np.eye(4)
        T_init[:3, 3] = pcd_depth.mean(axis=0)

        icp = ICPRegistration(pcd_depth, pcd_cad, transform_init=T_init)
        T_icp = icp.register(iteration=args.iterations)

        add_i, _ = metrics.average_distance([pcd_cad], [T_true], [T_init])
        add_f, _ = metrics.average_distance([pcd_cad], [T_true], [T_icp])
        adds_init.append(float(add_i[0]))
        adds_icp.append(float(add_f[0]))
        print(
            f"{instance_id:>8} {class_id:>5} "
            f"{adds_init[-1]:>10.4f} {adds_icp[-1]:>10.4f}"
        )

    print(
        f"mean ADD: init {np.mean(adds_init):.4f} -> "
        f"icp {np.mean(adds_icp):.4f} over {len(adds_icp)} instances"
    )


if __name__ == "__main__":
    main()
