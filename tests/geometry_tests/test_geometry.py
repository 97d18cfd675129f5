"""Tests for the host-side geometry layer."""

import numpy as np
import pytest

from morefusion_tpu import geometry


def test_pointcloud_from_depth_roundtrip(rng):
    H, W = 24, 32
    fx = fy = 50.0
    cx, cy = W / 2.0, H / 2.0
    depth = rng.uniform(0.5, 2.0, (H, W)).astype(np.float32)
    depth[3, 4] = np.nan
    pc = geometry.pointcloud_from_depth(depth, fx, fy, cx, cy)
    assert pc.shape == (H, W, 3)
    assert np.isnan(pc[3, 4]).all()
    # Reproject and check pixels.
    pts = pc[~np.isnan(pc).any(axis=2)]
    r, c = geometry.project_to_camera(pts, fx, fy, cx, cy)
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    valid = ~np.isnan(depth)
    np.testing.assert_allclose(r, ii[valid], atol=1e-4)
    np.testing.assert_allclose(c, jj[valid], atol=1e-4)


def test_masks_to_bboxes():
    mask = np.zeros((10, 12), dtype=bool)
    mask[2:5, 3:9] = True
    bbox = geometry.masks_to_bboxes(mask)
    np.testing.assert_array_equal(bbox, [2, 3, 5, 9])
    bboxes = geometry.masks_to_bboxes(np.stack([mask, np.zeros_like(mask)]))
    np.testing.assert_array_equal(bboxes[0], [2, 3, 5, 9])
    np.testing.assert_array_equal(bboxes[1], [0, 0, 0, 0])


def test_look_at_points_camera_z_axis_at_target():
    eye = np.array([1.0, 2.0, 3.0])
    target = np.array([0.0, 0.0, 0.0])
    T = geometry.look_at(eye, target)
    z_world = T[:3, :3] @ np.array([0, 0, 1.0])
    expected = (target - eye) / np.linalg.norm(target - eye)
    np.testing.assert_allclose(z_world, expected, atol=1e-9)
    np.testing.assert_allclose(T[:3, 3], eye, atol=1e-12)


def test_uniform_points_on_sphere_radius():
    pts = geometry.uniform_points_on_sphere(5, radius=2.0)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.0, atol=1e-9)


def test_quaternion_matrix_roundtrip(rng):
    import scipy.spatial.transform

    R = scipy.spatial.transform.Rotation.random(random_state=rng)
    T = np.eye(4)
    T[:3, :3] = R.as_matrix()
    q = geometry.quaternion_from_matrix(T)
    T2 = geometry.quaternion_matrix_np(q)
    np.testing.assert_allclose(T2, T, atol=1e-9)


def test_voxel_down_sample(rng):
    pts = rng.uniform(0, 1, (500, 3))
    down = geometry.voxel_down_sample(pts, 0.2)
    assert len(down) <= 5**3 + 25  # boundary voxels
    assert len(down) > 10


def test_estimate_pointcloud_normals_organized_plane():
    H, W = 16, 16
    jj, ii = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    pc = np.dstack([jj * 0.01, ii * 0.01, np.ones_like(jj)])
    normals = geometry.estimate_pointcloud_normals(pc)
    inner = np.abs(normals[4:-4, 4:-4] @ np.array([0, 0, 1.0]))
    np.testing.assert_allclose(inner, 1.0, atol=1e-6)


def test_voxel_mapping_add(rng):
    vm = geometry.VoxelMapping(
        origin=np.zeros(3), pitch=0.1, voxel_dim=8, nchannel=3
    )
    pts = rng.uniform(0, 0.79, (50, 3))
    vals = rng.uniform(0, 1, (50, 3))
    vm.add(pts, vals)
    assert vm.matrix.sum() > 0
    occ = vm.occupied_points()
    assert ((occ >= 0) & (occ <= 0.8)).all()


def test_trajectory_sort_and_interpolate(rng):
    pts = rng.uniform(0, 1, (8, 3))
    s = geometry.trajectory.sort(pts)
    assert s.shape == (7, 3)
    interp = geometry.trajectory.interpolate(s, 20)
    assert interp.shape == (20, 3)
    np.testing.assert_allclose(interp[0], s[0], atol=1e-9)
