"""Tests for the refinement stack: ICP, occupancy registration, ICC."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial.transform

from morefusion_tpu import contrib
from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.geometry.transform import quaternion_from_matrix


def _perturbed_pose(rng, angle_deg=8.0, trans=0.01):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = scipy.spatial.transform.Rotation.from_rotvec(
        np.radians(angle_deg) * axis
    ).as_matrix()
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.uniform(-trans, trans, 3)
    return T


def test_icp_recovers_small_perturbation(rng):
    models = ProceduralModels()
    cad = models.get_pcd(2)[:1000].astype(np.float32)  # cracker box

    T_true = np.eye(4)
    T_true[:3, 3] = [0.0, 0.0, 0.5]
    depth_points = cad @ T_true[:3, :3].T + T_true[:3, 3]

    T_init = T_true @ _perturbed_pose(rng, angle_deg=6, trans=0.008)
    reg = contrib.ICPRegistration(depth_points, cad, T_init)
    T_refined = reg.register(iteration=50, voxel_size=0.005)

    # ADD error should shrink substantially
    err_before = np.linalg.norm(
        (cad @ T_init[:3, :3].T + T_init[:3, 3]) - depth_points, axis=1
    ).mean()
    err_after = np.linalg.norm(
        (cad @ T_refined[:3, :3].T + T_refined[:3, 3]) - depth_points, axis=1
    ).mean()
    assert err_after < err_before * 0.2
    assert err_after < 0.003


def test_icp_gated_converges_early_at_equal_accuracy(rng):
    from morefusion_tpu.contrib.icp import (
        icp_point_to_point,
        icp_point_to_point_gated,
    )

    models = ProceduralModels()
    cad = models.get_pcd(2)[:512].astype(np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = [0.0, 0.0, 0.5]
    depth = cad @ T_true[:3, :3].T + T_true[:3, 3]
    T_init = (T_true @ _perturbed_pose(rng, angle_deg=6, trans=0.008)).astype(
        np.float32
    )

    T_full = icp_point_to_point(
        jnp.asarray(cad), jnp.asarray(depth), jnp.asarray(T_init),
        max_correspondence_distance=0.02, iterations=100,
    )
    T_gated, n = icp_point_to_point_gated(
        jnp.asarray(cad), jnp.asarray(depth), jnp.asarray(T_init),
        max_correspondence_distance=0.02, max_iterations=100,
    )
    assert int(n) < 100  # stopped on the relative-RMSE criterion

    def add_err(T):
        T = np.asarray(T)
        return np.linalg.norm(
            (cad @ T[:3, :3].T + T[:3, 3]) - depth, axis=1
        ).mean()

    assert add_err(T_gated) < 0.003
    assert abs(add_err(T_gated) - add_err(T_full)) < 1e-3


def test_register_iterative_matches_register(rng):
    models = ProceduralModels()
    cad = models.get_pcd(3)[:512].astype(np.float32)
    T_true = np.eye(4)
    T_true[:3, 3] = [0.0, 0.0, 0.4]
    depth = cad @ T_true[:3, :3].T + T_true[:3, 3]
    T_init = T_true @ _perturbed_pose(rng, angle_deg=5, trans=0.006)

    reg = contrib.ICPRegistration(depth, cad, T_init)
    Ts = list(reg.register_iterative(iteration=30, voxel_size=0.005))
    assert len(Ts) == 31
    err = np.linalg.norm(
        (cad @ Ts[-1][:3, :3].T + Ts[-1][:3, 3]) - depth, axis=1
    ).mean()
    assert err < 0.003


def test_gradient_icp_reduces_loss(rng):
    models = ProceduralModels()
    cad = models.get_pcd(4)[:500].astype(np.float32)
    T_true = np.eye(4)
    T_true[:3, 3] = [0, 0, 0.4]
    target = cad @ T_true[:3, :3].T + T_true[:3, 3]

    T_init = T_true @ _perturbed_pose(rng, angle_deg=5, trans=0.005)
    q0 = quaternion_from_matrix(T_init).astype(np.float32)
    t0 = T_init[:3, 3].astype(np.float32)
    q, t, losses = contrib.gradient_icp(
        jnp.asarray(cad), jnp.asarray(target), jnp.asarray(q0),
        jnp.asarray(t0), iterations=60,
    )
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(losses).all()


def test_occupancy_registration_improves_translation(rng):
    models = ProceduralModels()
    pcd = models.get_pcd(21)[:800].astype(np.float32)  # foam brick

    pitch = 0.01
    dims = (24, 24, 24)
    origin = np.array([-0.12, -0.12, -0.12], np.float32)

    from morefusion_tpu.functions import occupancy_grid_3d

    grid_occ = np.asarray(
        occupancy_grid_3d(pcd, pitch=pitch, origin=origin, dims=dims, threshold=1)
    )
    grid_target = np.stack([grid_occ, np.zeros_like(grid_occ)])

    T_init = np.eye(4)
    T_init[:3, 3] = [0.015, -0.01, 0.012]  # offset to recover
    reg = contrib.OccupancyRegistration(
        pcd, grid_target, pitch=pitch, origin=origin, threshold=1,
        transform_init=T_init,
    )
    T_out = reg.register(iteration=60)
    assert np.linalg.norm(T_out[:3, 3]) < np.linalg.norm(T_init[:3, 3])


def test_icc_reduces_collision_loss(rng):
    models = ProceduralModels()
    # two boxes, one initialized overlapping the other's observed space
    N = 2
    grids_t, grids_ne, points, sdfs, pitches, origins, Ts = (
        [], [], [], [], [], [], []
    )
    for i, cid in enumerate([21, 16]):
        vox = models.get_solid_voxel_grid(cid)
        points.append(vox.points.astype(np.float32))
        sdfs.append(vox.inside_distance.astype(np.float32))
        pitch = models.get_voxel_pitch(32, cid)
        pitches.append(pitch)
        origins.append(np.float32([-0.16, -0.16, -0.16]) + i * 0.02)
        T = np.eye(4)
        T[:3, 3] = [0.02 * i, 0, 0]
        Ts.append(T)
        g = np.zeros((32, 32, 32), np.float32)
        grids_t.append(g)
        gne = np.zeros((32, 32, 32), np.float32)
        gne[:16] = 0.8  # half the grid is known-nontarget/empty
        grids_ne.append(gne)

    icc = contrib.IterativeCollisionCheck(
        Ts, points, sdfs, pitches, origins,
        np.stack(grids_t), np.stack(grids_ne), max_points=512,
    )
    out, losses, n_iter = icc.refine(iterations=15)
    assert out.shape == (N, 4, 4)
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0] + 1e-6
    assert 1 <= n_iter <= 15


def test_icc_loss_penalizes_overlap():
    """Object inside known-empty space scores worse than outside it."""
    models = ProceduralModels()
    vox = models.get_solid_voxel_grid(21)
    pts = vox.points[:256].astype(np.float32)
    sdf = vox.inside_distance[:256].astype(np.float32)

    pitch = np.float32(models.get_voxel_pitch(32, 21))
    origin = np.float32([-0.08, -0.08, -0.08])
    gne = np.ones((1, 32, 32, 32), np.float32)  # everything is no-entry
    g_t = np.zeros((1, 32, 32, 32), np.float32)

    def loss_at(tz):
        return float(
            contrib.icc_loss(
                jnp.asarray([[1.0, 0, 0, 0]]),
                jnp.asarray([[0.0, 0, tz]]),
                jnp.asarray(pts[None]),
                jnp.asarray(sdf[None]),
                jnp.ones((1, 256), bool),
                jnp.asarray([pitch]),
                jnp.asarray(origin[None]),
                jnp.asarray(g_t),
                jnp.asarray(gne),
                jnp.ones((1,), bool),
            )
        )

    inside = loss_at(0.0)  # object sits inside the no-entry grid
    outside = loss_at(10.0)  # far away from the grid
    assert inside > outside


def test_icc_best_iterate_is_monotone_safe(rng):
    """refine() returns the best-loss iterate: evaluating the ICC
    objective at the returned poses can never be worse than at the
    initialization (the reference's last-iterate Adam CAN end worse —
    measured, ROUND4.md 2b). Also exercises the alpha_decay path."""
    models = ProceduralModels()
    cids = [21, 16]
    points = [
        models.get_solid_voxel_grid(c).points.astype(np.float32)
        for c in cids
    ]
    sdfs = [
        models.get_solid_voxel_grid(c).inside_distance.astype(np.float32)
        for c in cids
    ]
    pitches = [models.get_voxel_pitch(32, c) for c in cids]
    origins = [np.float32([-0.16, -0.16, -0.16])] * 2
    Ts = [np.eye(4), np.eye(4)]
    Ts[1] = Ts[1].copy()
    Ts[1][:3, 3] = [0.01, 0.005, 0.0]  # interpenetrating start
    g0 = np.zeros((32, 32, 32), np.float32)
    gne = np.zeros((32, 32, 32), np.float32)
    gne[:, :16] = 0.9
    icc = contrib.IterativeCollisionCheck(
        Ts, points, sdfs, pitches, origins,
        np.stack([g0, g0]), np.stack([gne, gne]), max_points=256,
    )
    loss0, _, _ = icc.loss_components()
    # deliberately over-long, no early stop: a last-iterate return
    # would be exposed to the oscillation regime
    icc.refine(iterations=40, early_stop=False, alpha_decay=True)
    loss1, _, _ = icc.loss_components()
    assert loss1 <= loss0 + 1e-5


def test_upsample_observed_grid_matches_original_centers(rng):
    from morefusion_tpu.contrib.collision_refine import (
        upsample_observed_grid,
    )

    g = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    up = upsample_observed_grid(g, 2)
    assert up.shape == (16, 16, 16)
    # even fine indices land exactly on original voxel centers
    np.testing.assert_allclose(up[::2, ::2, ::2], g, rtol=1e-6)
    # interpolated values are convex combinations of the originals
    assert up.min() >= g.min() - 1e-6 and up.max() <= g.max() + 1e-6
    # odd fine indices along an axis are neighbor midpoints (edge clamps)
    mid = up[1::2, ::2, ::2]
    expect = np.concatenate([0.5 * (g[:-1] + g[1:]), g[-1:]], axis=0)
    np.testing.assert_allclose(mid, expect, rtol=1e-5)


def test_upsampled_grid_preserves_icc_loss_landscape(rng):
    """The fine-pitch grid must describe the same scene: resampling an
    object's inside-grid into a frame built from the upsampled observed
    grid (same origin, pitch/2, 64^3) keeps the ICC loss finite and the
    GT configuration at lower loss than a gross perturbation."""
    from morefusion_tpu.contrib.collision_refine import (
        upsample_observed_grid,
    )
    from morefusion_tpu.contrib import IterativeCollisionCheck

    models = ProceduralModels()
    vox = models.get_solid_voxel_grid(2)
    pts = vox.points.astype(np.float32)
    sdf = vox.inside_distance.astype(np.float32)
    pitch, V = 0.01, 16
    origin = np.full(3, -0.08, np.float32)
    # observed target grid: voxelize the CAD at identity
    idx = np.round((pts - origin) / pitch).astype(int)
    ok = (idx >= 0).all(1) & (idx < V).all(1)
    g_t = np.zeros((V, V, V), np.float32)
    g_t[tuple(idx[ok].T)] = 1.0
    g_ne = np.zeros((V, V, V), np.float32)

    def loss_at(T, scale):
        icc = IterativeCollisionCheck(
            [T], [pts], [sdf], [pitch / scale], [origin],
            upsample_observed_grid(g_t, scale)[None],
            upsample_observed_grid(g_ne, scale)[None],
            voxel_dim=V * scale,
        )
        loss, _, _ = icc.loss_components()
        return loss

    T_gt = np.eye(4, dtype=np.float32)
    T_far = np.eye(4, dtype=np.float32)
    T_far[:3, 3] = [0.05, 0.0, 0.0]
    for scale in (1, 2):
        l_gt, l_far = loss_at(T_gt, scale), loss_at(T_far, scale)
        assert np.isfinite(l_gt) and np.isfinite(l_far)
        assert l_gt < l_far, (scale, l_gt, l_far)
