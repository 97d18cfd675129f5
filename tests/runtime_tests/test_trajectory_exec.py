"""Trajectory time-parameterization + execution (MoveIt IPTP role)."""

import numpy as np
import pytest

from morefusion_tpu.runtime import SimulatedRobotInterface
from morefusion_tpu.runtime.trajectory_exec import (
    TrajectoryExecutor,
    filter_place_poses,
    interpolate_pose,
    time_parameterize,
)


def _path(points):
    out = []
    for p in points:
        T = np.eye(4)
        T[:3, 3] = p
        out.append(T)
    return np.stack(out)


def test_trapezoidal_profile_long_path():
    # 1 m straight line, v_max 0.25, a_max 0.5 -> accel dist 0.0625 m,
    # cruise; total time = 2*t_acc + cruise = 2*0.5 + 0.875/0.25 = 4.5 s
    wp = _path([[0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
    t = time_parameterize(wp, v_max=0.25, a_max=0.5)
    assert t[0] == 0.0
    assert np.all(np.diff(t) > 0)
    assert t[-1] == pytest.approx(4.5, rel=1e-6)


def test_triangular_profile_short_path():
    # 0.1 m path can't reach v_max: peak = sqrt(a L) = sqrt(0.05),
    # total time = 2 * sqrt(L / a) = 2*sqrt(0.2)
    wp = _path([[0, 0, 0], [0.1, 0, 0]])
    t = time_parameterize(wp, v_max=0.25, a_max=0.5)
    assert t[-1] == pytest.approx(2 * np.sqrt(0.1 / 0.5), rel=1e-6)


def test_velocity_limit_respected():
    wp = _path(np.linspace([0, 0, 0], [1.0, 0, 0], 21))
    t = time_parameterize(wp, v_max=0.25, a_max=0.5)
    seg_v = 0.05 / np.diff(t)
    assert np.max(seg_v) <= 0.25 * 1.01


def test_interpolation_endpoints_and_rotation():
    from morefusion_tpu.geometry.transform import quaternion_matrix_np

    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, :3] = quaternion_matrix_np(
        np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])  # 90° z
    )[:3, :3]
    T1[:3, 3] = [0.2, 0, 0]
    wp = np.stack([T0, T1])
    t = time_parameterize(wp, v_max=0.1, a_max=0.5)
    assert np.allclose(interpolate_pose(wp, t, 0.0), T0)
    assert np.allclose(interpolate_pose(wp, t, t[-1]), T1)
    # midpoint of the path (by arc length) — 45° rotation
    Tm = interpolate_pose(wp, t, t[-1] / 2)
    ang = np.arccos(
        np.clip((np.trace(Tm[:3, :3]) - 1) / 2, -1, 1)
    )
    assert 0.0 < np.rad2deg(ang) < 90.0
    # rotation stays orthonormal
    assert np.allclose(Tm[:3, :3] @ Tm[:3, :3].T, np.eye(3), atol=1e-9)


def test_filter_place_poses():
    down = np.eye(4)
    down[:3, :3] = np.diag([1, -1, -1])  # z-axis -> -z (straight down)
    tilted = np.eye(4)  # z-axis -> +z (straight up)
    kept = filter_place_poses([down, tilted], np.deg2rad(30))
    assert len(kept) == 1
    assert np.allclose(kept[0], down)


def test_executor_steps_through_path():
    robot = SimulatedRobotInterface()
    ex = TrajectoryExecutor(robot, rate_hz=10.0)
    wp = _path([[0, 0, 0.2], [0.1, 0, 0.2], [0.2, 0, 0.3]])
    assert ex.execute(wp)
    moves = [c for c in robot.log if c[0] == "move_to"]
    assert len(moves) >= 5
    # first and last commanded poses are the path endpoints
    assert np.allclose(moves[0][1][:3, 3], [0, 0, 0.2])
    assert np.allclose(moves[-1][1][:3, 3], [0.2, 0, 0.3])
    # waypoint positions monotone along x
    xs = [m[1][0, 3] for m in moves]
    assert all(b >= a - 1e-9 for a, b in zip(xs, xs[1:]))


def test_executor_aborts_on_failure():
    robot = SimulatedRobotInterface(move_results=[True, True, False])
    ex = TrajectoryExecutor(robot, rate_hz=10.0)
    wp = _path([[0, 0, 0], [0.5, 0, 0]])
    assert not ex.execute(wp)
