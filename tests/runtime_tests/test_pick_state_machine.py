"""Scenario tests for the failure-hardened pick-and-place state machine.

VERDICT round-2 item 8: retry / re-scan / skip branches against the
simulated interface with injected failures (reference main loop:
``ri/pick_and_place.py:660-768``, which has none of these branches).
"""

import numpy as np

from morefusion_tpu import geometry
from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.runtime import (
    PickAndPlacePlanner,
    PickAndPlaceStateMachine,
    SimulatedRobotInterface,
)


def _scene_provider(n_calls=None):
    """Two stacked boxes (9 occludes 5 from this camera) + scan counter."""
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 0.025]
    T1 = np.eye(4)
    T1[:3, 3] = [0.02, 0.0, 0.09]  # above T0 -> occludes it
    calls = {"n": 0}

    def provider():
        calls["n"] += 1
        return dict(
            poses={
                5: dict(class_id=21, T_cad2world=T0.copy()),
                9: dict(class_id=16, T_cad2world=T1.copy()),
            },
            K=np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]]),
            T_cam2world=geometry.look_at([0.0, -0.05, 0.7], [0.01, 0, 0]),
            image_shape=(240, 320),
            place_poses={5: _pose([0.3, 0.3, 0.05]), 9: _pose([0.3, 0.4, 0.05])},
        )

    provider.calls = calls
    return provider


def _pose(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


def _machine(robot, provider, **kw):
    return PickAndPlaceStateMachine(
        PickAndPlacePlanner(ProceduralModels()), robot, provider,
        target_instance=5, **kw,
    )


def test_happy_path_places_occluder_then_target():
    provider = _scene_provider()
    robot = SimulatedRobotInterface()
    sm = _machine(robot, provider)
    outcomes = sm.run()

    assert [o.status for o in outcomes] == ["placed", "placed"]
    # occlusion order: 9 (on top) before the target 5
    assert [o.instance_id for o in outcomes] == [9, 5]
    assert all(o.grasp_attempts == 1 for o in outcomes)
    kinds = [c[0] for c in robot.log]
    assert kinds[-1] == "home"
    # every pick: suction on (grasp) + off (place), verified in between
    assert kinds.count("suction") == 4
    assert kinds.count("check_grasped") == 2


def test_grasp_failure_retries_then_succeeds():
    provider = _scene_provider()
    # first object: fail the vacuum check twice, succeed on 3rd attempt
    robot = SimulatedRobotInterface(grasp_results=[False, False, True])
    sm = _machine(robot, provider)
    outcomes = sm.run()

    assert [o.status for o in outcomes] == ["placed", "placed"]
    assert outcomes[0].grasp_attempts == 3
    # attempt 2 exceeds rescan_after_attempt=1 -> one fresh perception
    # pass before the 3rd try
    assert outcomes[0].rescans >= 1
    assert provider.calls["n"] >= 2
    # suction released after each failed check
    kinds = [c[0] for c in robot.log]
    assert kinds.count("check_grasped") == 4  # 3 for obj A, 1 for obj B


def test_persistent_grasp_failure_skips_and_continues():
    provider = _scene_provider()
    # object 9 never seals; object 5 still gets picked afterwards
    robot = SimulatedRobotInterface(grasp_results=[False, False, False])
    sm = _machine(robot, provider, max_grasp_attempts=3)
    outcomes = sm.run()

    by_id = {o.instance_id: o for o in outcomes}
    assert by_id[9].status == "skipped"
    assert by_id[9].grasp_attempts == 3
    assert by_id[5].status == "placed"


def test_unreachable_pose_triggers_rescan_then_skip():
    provider = _scene_provider()
    # every move fails -> both objects unreachable -> all skipped,
    # machine terminates (no infinite loop)
    robot = SimulatedRobotInterface(move_results=[False] * 50)
    sm = _machine(robot, provider, max_grasp_attempts=2)
    outcomes = sm.run()

    assert len(outcomes) == 2
    assert all(o.status == "skipped" for o in outcomes)
    assert all(o.rescans >= 1 for o in outcomes)


def test_place_failure_falls_back_to_drop():
    provider = _scene_provider()
    # moves: pre(T), grasp(T), lift(T), place(F) for first object ->
    # dropped; everything else succeeds
    robot = SimulatedRobotInterface(move_results=[True, True, True, False])
    sm = _machine(robot, provider)
    outcomes = sm.run()

    assert outcomes[0].status == "dropped"
    assert outcomes[1].status == "placed"
    # suction still released exactly once per pick
    kinds = [c[0] for c in robot.log]
    assert kinds.count("suction") == 4


def test_stops_after_target_without_emptying_scene():
    provider = _scene_provider()
    robot = SimulatedRobotInterface()
    sm = _machine(robot, provider)
    outcomes = sm.run()
    # target 5 reached -> loop ends even though nothing else remains is
    # irrelevant here (scene had only 2); check the target is last
    assert outcomes[-1].instance_id == 5
