#!/usr/bin/env python
"""Headless check: boundary-based multi-instance recovery -> PNG.

Renders a cluttered scene (duplicate classes likely), builds the GT
boundary map, and shows GT instances vs instances recovered by
``instances_from_predictions`` from the *ground-truth* class map +
boundary — isolating the instancing logic from model quality.
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import numpy as np


def main():
    from morefusion_tpu.datasets.instance_segmentation import (
        SyntheticInstanceSegmentationDataset,
    )
    from morefusion_tpu.extra import viz
    from morefusion_tpu.models.segmentation import (
        instances_from_predictions,
        match_instances,
    )

    ds = SyntheticInstanceSegmentationDataset(
        split="train", n_frames=1, n_objects=(8, 8), format="instance",
        seed=11,
    )
    ex = ds.get_example(0)
    lab, cm, bnd = ex["instance_label"], ex["class_label"], ex["boundary"]

    pred_label, pred_classes = instances_from_predictions(cm, bnd)
    gt_classes = {}
    for gid in np.unique(lab):
        if gid < 0:
            continue
        gt_classes[int(gid)] = int(cm[lab == gid][0])
    m, g, p = match_instances(pred_label, pred_classes, lab, gt_classes)
    print(
        f"instances: gt={g} recovered={p} matched(IoU>=0.5)={m}; "
        f"boundary pixels={int(bnd.sum())}"
    )

    rgb = ex["rgb"].astype(np.uint8)
    tiles = [
        rgb,
        viz.draw_instance_segmentation(rgb, lab, alpha=0.6),
        viz.draw_instance_segmentation(rgb, pred_label, alpha=0.6),
        np.stack([bnd.astype(np.uint8) * 255] * 3, axis=-1),
    ]
    out = "/tmp/mftpu_checks/segmentation_instances.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(out, viz.tile_images(tiles, cols=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
