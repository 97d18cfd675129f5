"""Camera-trajectory helpers: greedy KD sort + spline interpolation.

Reference: ``morefusion/geometry/trajectory.py:5-53``.
"""

from __future__ import annotations

import numpy as np
import scipy.interpolate
import scipy.spatial


def sort(points: np.ndarray) -> np.ndarray:
    """Greedy nearest-neighbor path through the points (drops the last one,
    matching the reference)."""
    assert points.ndim == 2 and points.shape[1] == 3

    points_left = points.copy()[1:]
    points_sorted = [points[0]]
    while len(points_sorted) < (len(points) - 1):
        kdtree = scipy.spatial.cKDTree(points_left)
        _, index = kdtree.query(points_sorted[-1])
        points_sorted.append(points_left[index])
        points_left = points_left[np.arange(len(points_left)) != index]
    return np.array(points_sorted, dtype=float)


def sort_by(points: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Order ``points`` by greedily matching each ``key`` point."""
    assert points.ndim == 2 and points.shape[1] == 3
    assert key.ndim == 2 and key.shape[1] == 3
    assert len(points) == len(key)

    points_sorted = []
    points_left = points.copy()
    for key_i in key:
        kdtree = scipy.spatial.cKDTree(points_left)
        _, index = kdtree.query(key_i)
        points_sorted.append(points_left[index])
        points_left = points_left[np.arange(len(points_left)) != index]
    return np.array(points_sorted)


def interpolate(keypoints: np.ndarray, n_points: int) -> np.ndarray:
    """Spline interpolation through the keypoints (cubic when possible)."""
    k = min(3, len(keypoints) - 1)
    tck, _ = scipy.interpolate.splprep(keypoints.T, s=0, k=k)
    points = scipy.interpolate.splev(np.linspace(0, 1, n_points), tck)
    return np.array(points, dtype=np.float64).T
