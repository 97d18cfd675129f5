"""Tests for occupancy grids and the truncated distance function."""

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest

from morefusion_tpu import functions as F


def test_occupancy_grid_1d_basic():
    points = np.array([0.05, 3.9], dtype=np.float32)
    m = np.asarray(
        F.occupancy_grid_1d(points, pitch=1.0, origin=0.0, dims=5, threshold=1)
    )
    assert m.shape == (5,)
    assert m[0] > 0.9 and m[4] > 0.85
    assert m[2] == 0.0


def test_occupancy_grid_3d_reference_example():
    """The example from the reference's __main__ gradient-check demo
    (``occupancy_grid_3d.py:88-119``)."""
    points = np.array([[0, 0.05, 0.1], [3.9, 3.95, 4]], dtype=np.float32)
    m = np.asarray(
        F.occupancy_grid_3d(
            points, pitch=1, origin=(0, 0, 0), dims=(5, 5, 5), threshold=1
        )
    )
    assert m.shape == (5, 5, 5)
    assert m[0, 0, 0] > 0.8
    assert m[4, 4, 4] > 0.8
    assert m[2, 2, 2] == 0.0
    assert m.max() <= 1.0 and m.min() >= 0.0


def _occupancy_3d_np(points, pitch, origin, dims, threshold):
    ip = (points - np.asarray(origin)) / pitch
    X, Y, Z = dims
    grid = np.zeros(dims)
    for i in range(X):
        for j in range(Y):
            for k in range(Z):
                d = np.sqrt(((np.array([i, j, k]) - ip) ** 2).sum(axis=1)).min()
                grid[i, j, k] = np.clip(threshold - d, 0, 1)
    return grid


def test_occupancy_grid_3d_matches_dense_reference(rng):
    points = rng.uniform(0, 4, (7, 3)).astype(np.float32)
    kwargs = dict(pitch=0.8, origin=(-0.2, 0.1, 0.0), dims=(5, 6, 4), threshold=2)
    m = np.asarray(F.occupancy_grid_3d(points, **kwargs))
    m_np = _occupancy_3d_np(points, **kwargs)
    np.testing.assert_allclose(m, m_np, atol=1e-5)


def test_occupancy_grid_3d_grads(rng):
    points = rng.uniform(0.5, 3.5, (4, 3))
    jax.test_util.check_grads(
        lambda p: F.occupancy_grid_3d(
            p, pitch=1.0, origin=(0, 0, 0), dims=(5, 5, 5), threshold=1.5
        ),
        (points,),
        order=1,
        modes=["rev"],
        atol=5e-2,
        rtol=5e-2,
        eps=1e-5,
    )


def _tdf_np(points, pitch, origin, dims, truncation):
    """Dense brute-force oracle: per-voxel exact distance to the nearest
    point, truncated. (Our implementation computes the exact field; the
    reference CUDA kernel bounds the search to a ksize^3 neighborhood —
    see tdf.py module docstring for the documented deviation.)"""
    X, Y, Z = dims
    tdf = np.full(dims, truncation, dtype=np.float32)
    winner = np.full(dims, -1, dtype=np.int32)
    ip = (points - np.asarray(origin)) / pitch
    for ix in range(X):
        for iy in range(Y):
            for iz in range(Z):
                d = pitch * np.sqrt(
                    ((ip - np.array([ix, iy, iz])) ** 2).sum(axis=1)
                )
                p = int(np.argmin(d))
                if d[p] < truncation:
                    tdf[ix, iy, iz] = d[p]
                    winner[ix, iy, iz] = p
    return tdf, winner


def test_tdf_matches_dense_oracle(rng):
    points = rng.uniform(0, 2.5, (10, 3)).astype(np.float32)
    kwargs = dict(pitch=0.5, origin=(0, 0, 0), dims=(5, 5, 5), truncation=1.2)
    tdf, idx = F.truncated_distance_function(
        points, return_indices=True, **kwargs
    )
    tdf_np, idx_np = _tdf_np(points, **kwargs)
    np.testing.assert_allclose(np.asarray(tdf), tdf_np, atol=1e-5)
    # Winner indices may differ on exact ties; distances must agree where
    # both have winners.
    hit = np.asarray(idx) >= 0
    np.testing.assert_array_equal(hit, idx_np >= 0)


def test_tdf_reference_demo_values():
    """The reference's __main__ demo (``truncated_distance_function.py:216+``)."""
    points = np.array([[0.5, 0.5, 0.5], [1.48, 1.48, 1.48]], dtype=np.float32)
    tdf = np.asarray(
        F.truncated_distance_function(
            points, pitch=0.5, origin=(0, 0, 0), dims=(5, 5, 5), truncation=1.2
        )
    )
    # Voxel (1,1,1) center is exactly at the first point -> distance 0.
    assert tdf[1, 1, 1] == pytest.approx(0.0, abs=1e-6)
    # Far voxels stay at truncation.
    assert tdf[4, 0, 0] == pytest.approx(1.2)


def test_tdf_grads(rng):
    points = rng.uniform(0.4, 2.0, (3, 3))
    jax.test_util.check_grads(
        lambda p: F.truncated_distance_function(
            p, pitch=0.5, origin=(0, 0, 0), dims=(5, 5, 5), truncation=1.2
        ),
        (points,),
        order=1,
        modes=["rev"],
        atol=5e-2,
        rtol=5e-2,
        eps=1e-6,
    )


def test_pseudo_occupancy_voxelization_shapes_and_ranges(rng):
    points = rng.uniform(0, 2.5, (20, 3)).astype(np.float32)
    sdf = rng.uniform(-0.1, 0.1, (20,)).astype(np.float32)
    u, s, i = F.pseudo_occupancy_voxelization(
        points, sdf, pitch=0.5, origin=(0, 0, 0), dims=(5, 5, 5), threshold=2
    )
    for g in (u, s, i):
        g = np.asarray(g)
        assert g.shape == (5, 5, 5)
        assert g.min() >= 0.0 and g.max() <= 1.0 + 1e-6
    # inside-weighting can only shrink the uniform grid
    assert np.all(np.asarray(i) <= np.asarray(u) + 1e-6)
    assert np.all(np.asarray(s) <= np.asarray(u) + 1e-6)
