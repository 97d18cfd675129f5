"""External pose-result loaders (comparison harnesses).

Reference counterparts:
- ``YCBVideoPoseCNNResultsDataset`` (``datasets/ycb_video/posecnn_results
  .py``): the PoseCNN toolbox results .mat files, used as eval-time
  detections/initializations.
- the DenseFusion comparison harness (``examples/ycb_video/dense_fusion``):
  re-scores externally produced poses and applies occupancy refinement.

Both are wrapped here as a generic "external results" contract: a list of
records {image_id, class_id, T_cad2cam (4, 4)} loadable from PoseCNN .mat
layouts or a plain JSON/npz dump.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..utils.provenance import get_data_path
from .base import DatasetBase


def load_results_json(path: str) -> List[dict]:
    """[{image_id, class_id, T_cad2cam (16 floats or nested)}] from JSON."""
    with open(path) as f:
        rows = json.load(f)
    out = []
    for r in rows:
        T = np.asarray(r["T_cad2cam"], dtype=np.float64).reshape(4, 4)
        out.append(
            dict(
                image_id=r.get("image_id"),
                class_id=int(r["class_id"]),
                T_cad2cam=T,
            )
        )
    return out


def load_posecnn_mat(path: str) -> List[dict]:
    """One PoseCNN toolbox results .mat -> records.

    Layout (YCB_Video_toolbox): ``rois`` (N, 7) with class id in col 1,
    ``poses`` (N, 7) quaternion wxyz + translation.
    """
    import scipy.io

    from ..geometry.transform import quaternion_matrix_np

    data = scipy.io.loadmat(path, squeeze_me=True)
    rois = np.atleast_2d(data["rois"])
    poses = np.atleast_2d(data["poses"])
    out = []
    for roi, pose in zip(rois, poses):
        class_id = int(roi[1])
        if class_id <= 0:
            continue
        T = quaternion_matrix_np(pose[:4])
        T[:3, 3] = pose[4:7]
        out.append(
            dict(
                image_id=os.path.splitext(os.path.basename(path))[0],
                class_id=class_id,
                T_cad2cam=T,
            )
        )
    return out


class YCBVideoPoseCNNResultsDataset(DatasetBase):
    """PoseCNN keyframe results (real data, when present).

    Expects the toolbox ``results_PoseCNN_RSS2018`` directory.
    """

    def __init__(self, root_dir: Optional[str] = None):
        self._root_dir = root_dir or get_data_path(
            "ycb_video", "YCB_Video_toolbox", "results_PoseCNN_RSS2018"
        )
        if not os.path.isdir(self._root_dir):
            raise IOError(
                f"PoseCNN results not found at {self._root_dir}"
            )
        self._ids = sorted(
            f[:-4]
            for f in os.listdir(self._root_dir)
            if f.endswith(".mat")
        )
        self._split = "keyframe"

    def get_example(self, index) -> List[dict]:
        return load_posecnn_mat(
            os.path.join(self._root_dir, self._ids[index] + ".mat")
        )
