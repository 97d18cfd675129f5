#!/usr/bin/env python
"""Headless check: fuse a synthetic frame into the C++ mapping backend and
re-render the predicted instance labels (OctomapServer render role)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np


def main():
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz
    from morefusion_tpu.geometry import pointcloud_from_depth
    from morefusion_tpu.geometry.transform import transform_points_np
    from morefusion_tpu.runtime.fusion import OccupancyFusion
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=3, random_state=np.random.RandomState(1)
    )
    gen.generate()
    T_cam = gen.random_camera_trajectory(4, 3)[0]
    frame = gen.render_frame(T_cam, shape=(240, 320))
    K = frame["intrinsic_matrix"]
    depth = frame["depth"]
    H, W = depth.shape
    pcd = pointcloud_from_depth(depth, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    flat = pcd.reshape(-1, 3)
    ok = ~np.isnan(flat).any(axis=1)
    pw = np.full_like(flat, np.nan)
    pw[ok] = transform_points_np(flat[ok], frame["T_cam2world"])
    pw = pw.reshape(H, W, 3)

    fusion = OccupancyFusion(models, size_filter=False)
    inst_to_class = {
        int(i): int(c)
        for i, c in zip(frame["instance_ids"], frame["class_ids"])
    }
    fusion.process_frame(
        pw, frame["instance_label"], inst_to_class, track=False,
        camera_origin=frame["T_cam2world"][:3, 3],
    )
    label, rendered_depth = fusion.render_labels(
        K, frame["T_cam2world"], (H, W)
    )
    agree = (
        (label == frame["instance_label"])[frame["instance_label"] >= 0]
    ).mean()
    print(f"raycast label agreement on object pixels: {agree:.3f}")
    out = "/tmp/mftpu_checks/mapping_render.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(
        out,
        viz.tile_images(
            [
                viz.colorize_label(frame["instance_label"]),
                viz.colorize_label(label),
            ]
        ),
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
