#!/usr/bin/env python
"""Occupancy-grid alignment study (reference:
``examples/ycb_video/preliminary/align_occupancy_grids.py``).

Fuses a synthetic frame into the multi-instance occupancy map, extracts a
target instance's probability grids, perturbs its ground-truth pose, and
runs the differentiable occupancy registration
(``contrib/occupancy_registration.py``) back toward the observed grid.
Reports the ADD trajectory across iterations.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import argparse

import numpy as np

from morefusion_tpu import geometry, metrics
from morefusion_tpu.contrib import (
    MultiInstanceOccupancyMapping,
    OccupancyRegistration,
)
from morefusion_tpu.datasets.rgbd_pose_estimation.synthetic import (
    SyntheticRGBDPoseEstimationDataset,
)
from morefusion_tpu.geometry.transform import quaternion_matrix_np


def _perturbed(T, rng, angle=0.15, shift=0.02):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    half = angle / 2.0
    q = np.concatenate([[np.cos(half)], np.sin(half) * axis])
    dT = quaternion_matrix_np(q.astype(np.float32))
    dT[:3, 3] = rng.uniform(-shift, shift, 3)
    return T @ dT


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--voxel-dim", type=int, default=32)
    args = parser.parse_args()

    rng = np.random.RandomState(args.seed)
    ds = SyntheticRGBDPoseEstimationDataset(seed=args.seed)
    frame = ds.get_frame(args.frame)
    models = ds.models

    K = frame["intrinsic_matrix"]
    pcd = geometry.pointcloud_from_depth(
        frame["depth"], fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2]
    )
    nonnan = ~np.isnan(pcd).any(axis=2)

    # fuse every instance (reference fuses the frame's octrees first)
    mapping = MultiInstanceOccupancyMapping()
    for i, instance_id in enumerate(frame["instance_ids"]):
        class_id = int(frame["class_ids"][i])
        pitch = models.get_voxel_pitch(args.voxel_dim, class_id)
        mapping.initialize(int(instance_id), pitch=pitch)
        mask = frame["instance_label"] == instance_id
        mapping.integrate(int(instance_id), mask, pcd)

    # pick the most visible instance as the target
    areas = [
        (frame["instance_label"] == i).sum() for i in frame["instance_ids"]
    ]
    ti = int(np.argmax(areas))
    target_id = int(frame["instance_ids"][ti])
    class_id = int(frame["class_ids"][ti])
    T_true = frame["Ts_cad2cam"][ti]
    pitch = models.get_voxel_pitch(args.voxel_dim, class_id)

    mask = (frame["instance_label"] == target_id) & nonnan
    center = np.nanmedian(pcd[mask], axis=0)
    origin = center - pitch * (args.voxel_dim / 2.0 - 0.5)

    grid_target, grid_nontarget, grid_empty = mapping.get_target_grids(
        target_id,
        dimensions=(args.voxel_dim,) * 3,
        pitch=pitch,
        origin=origin,
    )
    # registration consumes stacked [occupied, empty, other-occupied]
    # grids: reward overlap with the target's occupied space, penalize
    # overlap with observed-free and other instances' space.
    grids = np.stack([grid_target, grid_empty, grid_nontarget])

    pcd_cad = models.get_pcd(class_id).astype(np.float32)
    T_init = _perturbed(T_true, rng)

    reg = OccupancyRegistration(
        pcd_cad,
        grids,
        pitch=pitch,
        origin=origin,
        threshold=2.0,
        transform_init=T_init,
    )
    print(f"target instance {target_id} (class {class_id})")
    for it, T in enumerate(
        reg.register_iterative(iteration=args.iterations)
    ):
        if it % max(1, args.iterations // 10) == 0 or it == args.iterations:
            add, _ = metrics.average_distance([pcd_cad], [T_true], [T])
            print(f"iter {it:>4}: ADD {float(add[0]):.4f}")


if __name__ == "__main__":
    main()
