"""Tests for the pick-and-place planner + simulated adapter."""

import numpy as np

from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.runtime import (
    PickAndPlacePlanner,
    SimulatedRobotInterface,
)


def test_plan_and_execute_pick_sequence():
    models = ProceduralModels()
    planner = PickAndPlacePlanner(models)

    # two boxes on a table, camera above
    T0 = np.eye(4); T0[:3, 3] = [0.0, 0.0, 0.025]
    T1 = np.eye(4); T1[:3, 3] = [0.12, 0.0, 0.04]
    poses = {
        5: dict(class_id=21, T_cad2world=T0),
        9: dict(class_id=16, T_cad2world=T1),
    }
    from morefusion_tpu import geometry

    T_cam = geometry.look_at([0.0, -0.4, 0.6], [0.05, 0, 0])
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])

    plan = planner.plan_picks(
        poses, K, T_cam, (240, 320), target_instance=5
    )
    assert len(plan) >= 1
    assert plan[-1].instance_id == 5  # target picked last
    for action in plan:
        # grasp approaches from above-ish and pre-grasp is offset back
        d = action.pre_grasp_pose[:3, 3] - action.grasp_pose[:3, 3]
        assert np.linalg.norm(d) > 0.02
        assert action.lift_pose[2, 3] > action.grasp_pose[2, 3]

    robot = SimulatedRobotInterface()
    assert planner.execute(plan, robot)
    kinds = [c[0] for c in robot.log]
    assert kinds.count("suction") == 2 * len(plan)
    assert kinds[-1] == "home"


def test_scan_poses():
    models = ProceduralModels()
    planner = PickAndPlacePlanner(models)
    poses = planner.scan_poses(n=5)
    assert poses.shape == (5, 4, 4)
    # all look at the workspace center: z-axis roughly towards origin
    for T in poses:
        to_origin = -T[:3, 3] / np.linalg.norm(T[:3, 3])
        assert to_origin @ T[:3, 2] > 0.9
