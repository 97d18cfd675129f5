#!/usr/bin/env python
"""Headless check: browse pose-estimation training examples -> PNG tiles.

Equivalent of ``checks/datasets_checks/ycb_video_checks/check_dataset.py``
(interactive browser) for a reindexed/packed or inline-generated set: each
tile shows the instance RGB crop, the depth-colored PCD, and the
occupancy-grid slice sums.

Usage: python checks/check_dataset_browse.py [--data DIR] [--n 8]
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default=None, help="reindexed/packed dir")
    parser.add_argument("--n", type=int, default=8)
    args = parser.parse_args()

    from morefusion_tpu import datasets
    from morefusion_tpu.extra import viz

    if args.data and datasets.is_packed(args.data):
        ds = datasets.PackedPoseDataset(args.data)
    elif args.data:
        ds = datasets.RGBDPoseEstimationDatasetReIndexed(args.data)
    else:
        src = datasets.SyntheticRGBDPoseEstimationDataset(
            split="train", n_frames=2, n_objects=(3, 5)
        )
        root = "/tmp/mftpu_checks/browse_data"
        if not os.path.exists(os.path.join(root, "meta.json")):
            datasets.reindex(root, [src], n_workers=1, progress=False)
        ds = datasets.RGBDPoseEstimationDatasetReIndexed(root)

    tiles = []
    for i in range(min(args.n, len(ds))):
        ex = ds.get_example(i)
        rgb = np.asarray(ex["rgb"], np.uint8)
        depth = np.asarray(ex["pcd"])[..., 2]
        d_rgb = viz.depth_to_rgb(depth)
        grid = np.asarray(ex["grid_target"], np.float32)
        g_img = (grid.sum(axis=2) > 0).astype(np.uint8) * 255
        g_rgb = np.stack([g_img] * 3, axis=-1)
        import cv2

        g_rgb = cv2.resize(
            g_rgb, rgb.shape[:2][::-1], interpolation=cv2.INTER_NEAREST
        )
        tiles.append(np.concatenate([rgb, d_rgb, g_rgb], axis=1))
        print(
            f"example {i}: class={int(ex['class_id'])} "
            f"pitch={float(ex['pitch']):.4f}"
        )

    out = "/tmp/mftpu_checks/dataset_browse.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(out, viz.tile_images(tiles, cols=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
