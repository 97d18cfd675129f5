"""Recorded-frame dataset: a directory of npz frames -> example factory.

Role of the reference's ``my_real`` / ``my_synthetic`` frame sources
(``datasets/rgbd_pose_estimation/my_real/dataset.py`` etc.): recorded
RGB-D sequences stored on disk feed the same instance-example factory.
Each ``<root>/<id>.npz`` holds the frame contract keys (rgb, depth,
instance_label, instance_ids, class_ids, intrinsic_matrix, T_cam2world,
Ts_cad2cam) — exactly what ``SceneGenerationBase.render_frame`` returns,
so synthetic sequences can be dumped with ``save_frame`` and real sensor
recordings converted to the same layout.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .base import RGBDPoseEstimationDatasetBase

FRAME_KEYS = (
    "rgb",
    "depth",
    "instance_label",
    "instance_ids",
    "class_ids",
    "intrinsic_matrix",
    "T_cam2world",
    "Ts_cad2cam",
)


def save_frame(path: str, frame: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, **{k: frame[k] for k in FRAME_KEYS if k in frame}
    )


class FrameDirectoryDataset(RGBDPoseEstimationDatasetBase):
    def __init__(self, root_dir: str, models, class_ids=None):
        super().__init__(models, class_ids=class_ids)
        if not os.path.isdir(root_dir):
            raise IOError(f"{root_dir} does not exist")
        self._root_dir = root_dir
        self._ids = sorted(
            f[:-4] for f in os.listdir(root_dir) if f.endswith(".npz")
        )

    def get_frame(self, index) -> dict:
        data = dict(
            np.load(os.path.join(self._root_dir, self._ids[index] + ".npz"))
        )
        return data
