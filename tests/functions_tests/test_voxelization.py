"""Tests for voxelization/interpolation ops vs. NumPy reference loops.

The NumPy oracles reproduce the reference's CPU kernels
(``average_voxelization_3d.py:8-40``, ``max_voxelization_3d.py:8-41``,
``interpolate_voxel_grid.py`` CPU path) — grids here are channels-last.
"""

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest

from morefusion_tpu import functions as F


DIMS = (8, 8, 8)
PITCH = 0.25
ORIGIN = (-1.0, -1.0, -1.0)


def _make_points(rng, P, B):
    values = rng.uniform(-1, 1, (P, 5)).astype(np.float32)
    points = rng.uniform(-1.1, 1.1, (P, 3)).astype(np.float32)
    batch_indices = rng.randint(0, B, (P,)).astype(np.int32)
    return values, points, batch_indices


def _avg_voxelize_np(values, points, batch_indices, B, dims, origin, pitch):
    X, Y, Z = dims
    C = values.shape[1]
    grid = np.zeros((B, X, Y, Z, C), dtype=np.float32)
    counts = np.zeros((B, X, Y, Z), dtype=np.int32)
    for i in range(len(points)):
        idx = np.round((points[i] - np.asarray(origin)) / pitch).astype(int)
        if np.all((idx >= 0) & (idx < np.asarray(dims))):
            b = batch_indices[i]
            grid[b, idx[0], idx[1], idx[2]] += values[i]
            counts[b, idx[0], idx[1], idx[2]] += 1
    nz = counts > 0
    grid[nz] /= counts[nz][:, None]
    return grid, counts


def test_average_voxelization_matches_reference_loop(rng):
    B = 2
    values, points, batch_indices = _make_points(rng, 200, B)
    grid, counts = F.average_voxelization_3d(
        values,
        points,
        batch_indices,
        batch_size=B,
        origin=ORIGIN,
        pitch=PITCH,
        dimensions=DIMS,
        return_counts=True,
    )
    grid_np, counts_np = _avg_voxelize_np(
        values, points, batch_indices, B, DIMS, ORIGIN, PITCH
    )
    np.testing.assert_allclose(np.asarray(grid), grid_np, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts), counts_np)


def test_average_voxelization_nan_points_dropped(rng):
    B = 1
    values, points, batch_indices = _make_points(rng, 50, B)
    points[10] = np.nan
    grid = F.average_voxelization_3d(
        values, points, batch_indices,
        batch_size=B, origin=ORIGIN, pitch=PITCH, dimensions=DIMS,
    )
    assert not np.any(np.isnan(np.asarray(grid)))


def test_average_voxelization_grad_is_gather_of_grad_over_count(rng):
    """Reference backward: gvalues[p] = gmatrix[voxel(p)] / count (bwd_cpu)."""
    B = 1
    values, points, batch_indices = _make_points(rng, 40, B)

    def f(v):
        return jnp.sum(
            F.average_voxelization_3d(
                v, points, batch_indices,
                batch_size=B, origin=ORIGIN, pitch=PITCH, dimensions=DIMS,
            )
            ** 2
        )

    jax.test_util.check_grads(
        f, (values.astype(np.float64),), order=1, modes=["rev"],
        atol=1e-3, rtol=1e-3,
    )


def test_max_voxelization_matches_reference_loop(rng):
    B = 2
    values, points, batch_indices = _make_points(rng, 150, B)
    intensities = rng.uniform(0, 1, (150,)).astype(np.float32)

    grid, indices = F.max_voxelization_3d(
        values, points, batch_indices, intensities,
        batch_size=B, origin=ORIGIN, pitch=PITCH, dimensions=DIMS,
        return_indices=True,
    )

    X, Y, Z = DIMS
    C = values.shape[1]
    grid_np = np.zeros((B, X, Y, Z, C), dtype=np.float32)
    idx_np = np.full((B, X, Y, Z), -1, dtype=np.int32)
    best = np.full((B, X, Y, Z), -np.inf)
    for i in range(len(points)):
        idx = np.round((points[i] - np.asarray(ORIGIN)) / PITCH).astype(int)
        if np.all((idx >= 0) & (idx < np.asarray(DIMS))):
            b = batch_indices[i]
            key = (b, idx[0], idx[1], idx[2])
            if intensities[i] > best[key]:
                best[key] = intensities[i]
                grid_np[key] = values[i]
                idx_np[key] = i
    np.testing.assert_allclose(np.asarray(grid), grid_np, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(indices), idx_np)


def test_interpolate_voxel_grid_matches_trilinear(rng):
    B, X, Y, Z, C = 2, 6, 6, 6, 4
    grid = rng.uniform(-1, 1, (B, X, Y, Z, C)).astype(np.float32)
    P = 30
    points = rng.uniform(0, 5, (P, 3)).astype(np.float32)
    batch_indices = rng.randint(0, B, (P,)).astype(np.int32)

    out = np.asarray(F.interpolate_voxel_grid(grid, points, batch_indices))

    import scipy.interpolate

    for b in range(B):
        sel = batch_indices == b
        if not sel.any():
            continue
        interp = scipy.interpolate.RegularGridInterpolator(
            (np.arange(X), np.arange(Y), np.arange(Z)), grid[b]
        )
        np.testing.assert_allclose(out[sel], interp(points[sel]), atol=1e-4)


def test_interpolate_voxel_grid_out_of_bounds_is_partial(rng):
    B, X, Y, Z, C = 1, 4, 4, 4, 2
    grid = np.ones((B, X, Y, Z, C), dtype=np.float32)
    # Point at -0.5: only the corner at index 0 is in bounds, weight 0.5 each
    # axis -> 0.125 total.
    points = np.array([[-0.5, -0.5, -0.5]], dtype=np.float32)
    out = np.asarray(
        F.interpolate_voxel_grid(grid, points, np.zeros(1, np.int32))
    )
    np.testing.assert_allclose(out, 0.125 * np.ones((1, C)), atol=1e-6)


def test_interpolate_voxel_grid_grads(rng):
    B, X, Y, Z, C = 1, 4, 4, 4, 2
    grid = rng.uniform(size=(B, X, Y, Z, C))
    points = rng.uniform(0.2, 2.8, (5, 3))
    bi = np.zeros(5, np.int32)
    jax.test_util.check_grads(
        lambda g, p: F.interpolate_voxel_grid(g, p, bi),
        (grid, points),
        order=1,
        modes=["rev"],
        atol=1e-3,
        rtol=1e-3,
    )


def test_voxelize_interpolate_roundtrip(rng):
    """A feature scattered to a voxel center reads back exactly."""
    B = 1
    values = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    # Place points exactly at voxel centers (so round == floor == exact).
    vox = rng.randint(1, 7, (10, 3))
    points = (vox * PITCH + np.asarray(ORIGIN)).astype(np.float32)
    bi = np.zeros(10, np.int32)

    grid = F.average_voxelization_3d(
        values, points, bi,
        batch_size=B, origin=ORIGIN, pitch=PITCH, dimensions=DIMS,
    )
    out = np.asarray(
        F.interpolate_voxel_grid(grid, vox.astype(np.float32), bi)
    )
    # Voxels hit once: exact roundtrip (duplicates average, so just check
    # uniquely-voxelized points).
    lin = vox[:, 0] * 64 + vox[:, 1] * 8 + vox[:, 2]
    unique, counts = np.unique(lin, return_counts=True)
    once = np.isin(lin, unique[counts == 1])
    np.testing.assert_allclose(out[once], values[once], atol=1e-5)


def test_interpolate_sorted_vjp_matches_autodiff(rng):
    """The sort-based VJP must agree with plain autodiff exactly:
    value, grid-cotangent, and points-cotangent, including points whose
    corner neighborhoods are partially or fully out of bounds."""
    B, X, Y, Z, C = 2, 5, 6, 4, 3
    grid = rng.uniform(-1, 1, (B, X, Y, Z, C))
    P = 64
    # in-bounds, straddling the border, and fully outside
    points = np.concatenate(
        [
            rng.uniform(0, 3.5, (P - 8, 3)),
            rng.uniform(-1.5, 0.5, (4, 3)),
            rng.uniform(6.0, 8.0, (4, 3)),
        ]
    )
    bi = rng.randint(0, B, (P,)).astype(np.int32)
    cot = rng.uniform(-1, 1, (P, C))

    def loss_plain(g, p):
        return jnp.sum(F.interpolate_voxel_grid(g, p, bi) * cot)

    def loss_sorted(g, p):
        return jnp.sum(F.interpolate_voxel_grid_sorted(g, p, bi) * cot)

    v0 = loss_plain(grid, points)
    v1 = loss_sorted(grid, points)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-12)

    g0, p0 = jax.grad(loss_plain, argnums=(0, 1))(grid, points)
    g1, p1 = jax.grad(loss_sorted, argnums=(0, 1))(grid, points)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-10)


def test_interpolate_sorted_vjp_jit_and_checkgrads(rng):
    B, X, Y, Z, C = 1, 4, 4, 4, 2
    grid = rng.uniform(size=(B, X, Y, Z, C))
    points = rng.uniform(0.2, 2.8, (5, 3))
    bi = np.zeros(5, np.int32)
    jax.test_util.check_grads(
        jax.jit(lambda g, p: F.interpolate_voxel_grid_sorted(g, p, bi)),
        (grid, points),
        order=1,
        modes=["rev"],
        atol=1e-3,
        rtol=1e-3,
    )
