#!/usr/bin/env python
"""Headless data visualization (reference:
``examples/ycb_video/preliminary/visualize_pcds.py`` +
``visualize_grids.py``).

Renders a synthetic frame's RGB, depth colormap, instance labels, a
ground-truth CAD pose overlay, and the fused occupancy grid of the most
visible instance (marching-cubes OBJ) into an output directory.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import argparse
import os

import numpy as np

from morefusion_tpu import geometry
from morefusion_tpu.contrib import MultiInstanceOccupancyMapping
from morefusion_tpu.datasets.rgbd_pose_estimation.synthetic import (
    SyntheticRGBDPoseEstimationDataset,
)
from morefusion_tpu.extra import viz


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="/tmp/mftpu_preliminary_viz")
    parser.add_argument("--voxel-dim", type=int, default=32)
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    ds = SyntheticRGBDPoseEstimationDataset(seed=args.seed)
    frame = ds.get_frame(args.frame)
    models = ds.models
    K = frame["intrinsic_matrix"]

    tiles = [
        frame["rgb"],
        viz.depth_to_rgb(frame["depth"]),
        viz.colorize_label(frame["instance_label"]),
        viz.draw_pose_overlay(
            frame["rgb"],
            models,
            list(frame["class_ids"]),
            list(frame["Ts_cad2cam"]),
            K,
        ),
    ]
    tiled = viz.tile_images(tiles, cols=2)
    viz.save_image(os.path.join(args.out, "frame.png"), tiled)

    # fused occupancy grid of the most visible instance -> OBJ mesh
    pcd = geometry.pointcloud_from_depth(
        frame["depth"], fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2]
    )
    areas = [
        (frame["instance_label"] == i).sum() for i in frame["instance_ids"]
    ]
    ti = int(np.argmax(areas))
    target_id = int(frame["instance_ids"][ti])
    class_id = int(frame["class_ids"][ti])
    pitch = models.get_voxel_pitch(args.voxel_dim, class_id)

    mapping = MultiInstanceOccupancyMapping()
    mapping.initialize(target_id, pitch=pitch)
    mask = frame["instance_label"] == target_id
    mapping.integrate(target_id, mask, pcd)

    nonnan = ~np.isnan(pcd).any(axis=2)
    center = np.nanmedian(pcd[mask & nonnan], axis=0)
    origin = center - pitch * (args.voxel_dim / 2.0 - 0.5)
    grid, _, _ = mapping.get_target_grids(
        target_id,
        dimensions=(args.voxel_dim,) * 3,
        pitch=pitch,
        origin=origin,
    )
    verts, faces = viz.voxel_grid_to_mesh(grid, pitch=pitch, origin=origin)
    viz.save_obj(os.path.join(args.out, "grid_target.obj"), verts, faces)
    print(f"wrote {args.out}/frame.png and grid_target.obj "
          f"({len(verts)} verts)")


if __name__ == "__main__":
    main()
