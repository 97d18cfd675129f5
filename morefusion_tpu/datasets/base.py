"""Dataset / model-bank abstract contracts.

Reference: ``morefusion/datasets/base.py:7-61`` — datasets expose
``root_dir/split/ids`` + ``get_example``; model banks expose per-class CAD
assets (point cloud, SDF, solid voxel grid, voxel pitch).
"""

from __future__ import annotations

import numpy as np


class DatasetBase:
    _root_dir = None
    _split = None
    _ids = None

    @property
    def root_dir(self):
        return self._root_dir

    @property
    def split(self):
        return self._split

    @property
    def ids(self):
        return self._ids

    def __len__(self):
        return len(self.ids)

    def get_example(self, index):
        raise NotImplementedError

    def __getitem__(self, index):
        return self.get_example(index)


class VoxelGrid:
    """Solid voxelization result: occupied voxel centers + metadata.

    Stands in for the reference's binvox-backed
    ``trimesh.voxel.VoxelGrid`` (only ``.points`` and pitch/origin are used
    downstream).
    """

    def __init__(self, points, pitch, origin, inside_distance=None):
        self.points = np.asarray(points)
        self.pitch = float(pitch)
        self.origin = np.asarray(origin)
        #: inside-positive distance per point (the reference's SDF
        #: convention from trimesh.proximity.signed_distance)
        self.inside_distance = (
            None if inside_distance is None else np.asarray(inside_distance)
        )


class ModelsBase:
    """Per-class CAD asset bank."""

    @property
    def class_names(self):
        raise NotImplementedError

    @property
    def n_class(self):
        return len(self.class_names)

    def get_pcd(self, class_id) -> np.ndarray:
        """(N, 3) surface points of the CAD model."""
        raise NotImplementedError

    def get_sdf(self, class_id):
        """(points (N, 3), inside-positive distance (N,)) for solid points."""
        raise NotImplementedError

    def get_solid_voxel_grid(self, class_id) -> VoxelGrid:
        raise NotImplementedError

    def get_bbox_diagonal(self, class_id) -> float:
        raise NotImplementedError

    def get_voxel_pitch(self, dimension, class_id) -> float:
        """Reference: ``bbox_diagonal / dimension``
        (``morefusion/datasets/ycb_video/models.py:113-115``)."""
        return self.get_bbox_diagonal(class_id) / dimension
