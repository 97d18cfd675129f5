"""Mask/box utilities.

Reference: ``morefusion/geometry/masks_to_bboxes.py``,
``get_aabb_from_points.py`` (the Open3D down-sampling is replaced by
``pointcloud.voxel_down_sample``).
"""

from __future__ import annotations

import numpy as np

from .pointcloud import voxel_down_sample


def masks_to_bboxes(masks: np.ndarray) -> np.ndarray:
    """Boolean mask image(s) -> (y1, x1, y2, x2) boxes.

    ``(H, W)`` -> ``(4,)``; ``(N, H, W)`` -> ``(N, 4)``. Empty masks produce
    all-zero boxes.
    """
    masks = np.asarray(masks)
    assert masks.dtype == bool
    ndim = masks.ndim
    assert ndim in (2, 3), "masks must be 2 or 3 dimensional"
    if ndim == 2:
        masks = masks[None]

    bboxes = np.zeros((len(masks), 4), dtype=np.float64)
    for i, mask in enumerate(masks):
        # row/col projections instead of argwhere: two O(H*W) bool
        # reductions + O(H+W) scans, vs materializing every true pixel
        rows = mask.any(axis=1)
        if not rows.any():
            continue
        cols = mask.any(axis=0)
        y_idx = np.flatnonzero(rows)
        x_idx = np.flatnonzero(cols)
        bboxes[i] = y_idx[0], x_idx[0], y_idx[-1] + 1, x_idx[-1] + 1
    return bboxes[0] if ndim == 2 else bboxes


def get_aabb_from_points(points: np.ndarray):
    """Percentile-style robust AABB: down-sample, keep the dominant spatial
    cluster, return its (min, max).

    Reference: ``morefusion/geometry/get_aabb_from_points.py`` (hierarchical
    clustering at 2 cm after 1 cm voxel down-sampling).
    """
    import scipy.cluster.hierarchy

    down = voxel_down_sample(points=points, voxel_size=0.01)
    if len(down) <= 1:
        return down.min(axis=0), down.max(axis=0)
    labels = scipy.cluster.hierarchy.fclusterdata(
        down, criterion="distance", t=0.02
    )
    ids, counts = np.unique(labels, return_counts=True)
    keep = labels == ids[np.argmax(counts)]
    down = down[keep]
    return down.min(axis=0), down.max(axis=0)
