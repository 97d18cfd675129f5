#!/usr/bin/env python
"""Headless check: host + device augmentation side-by-side -> PNG grid.

Shows one instance crop under (row 1) the host mask-truncation
augmentation and (row 2) the device photometric/noise augmentation
(``training/augment_device.py``) at several RNG seeds — the visual twin of
the reference's imgaug stack (``reindexed.py:39-75``).
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import numpy as np


def main():
    from morefusion_tpu import datasets
    from morefusion_tpu.datasets.rgbd_pose_estimation.augmentation import (
        augment_mask,
    )
    from morefusion_tpu.extra import viz

    src = datasets.SyntheticRGBDPoseEstimationDataset(
        split="train", n_frames=1, n_objects=(3, 4)
    )
    ex = src.get_example(0)[0]
    rgb, pcd = ex["rgb"], ex["pcd"]

    host_rng = np.random.RandomState(0)
    row1 = [rgb] + [
        augment_mask(rgb, pcd, host_rng)[0] for _ in range(3)
    ]

    import jax

    from morefusion_tpu.training import augment_device

    aug = jax.jit(augment_device.augment_rgb_device)
    row2 = [rgb] + [
        np.asarray(
            aug(jax.random.PRNGKey(s), rgb[None].astype(np.float32))
        )[0].astype(np.uint8)
        for s in range(1, 4)
    ]

    out = "/tmp/mftpu_checks/augmentation.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(out, viz.tile_images(row1 + row2, cols=4))
    print("wrote", out)


if __name__ == "__main__":
    main()
