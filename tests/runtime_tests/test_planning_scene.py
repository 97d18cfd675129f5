"""Planning-scene lifecycle + collision-aware motion gating.

VERDICT round-4 §2.1: upgrades the MoveIt scene-update service from an
adapter contract to a working equivalent (reference
``ros/src/morefusion_ros_panda/src/update_scene_service.cpp:25-80``,
scene bookkeeping ``ri/pick_and_place.py:549-615``).
"""

import numpy as np

from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.runtime import (
    CollisionAwareRobot,
    PlanningScene,
    SimulatedRobotInterface,
)


def _pose(x, y, z):
    T = np.eye(4)
    T[:3, 3] = [x, y, z]
    return T


def _scene(**kw):
    return PlanningScene(ProceduralModels(), **kw)


def _diag(scene, class_id):
    return scene._models.get_bbox_diagonal(class_id)


def test_lifecycle_add_move_remove_attach_detach():
    scene = _scene()
    scene.add_object(7, 1, _pose(0.3, 0.0, 0.05))
    assert [o.instance_id for o in scene.world_objects()] == [7]
    # MOVE = ADD with an existing id
    scene.add_object(7, 1, _pose(0.4, 0.0, 0.05))
    assert len(scene.world_objects()) == 1
    assert np.allclose(scene.world_objects()[0].T_cad2world[:3, 3],
                       [0.4, 0.0, 0.05])
    # grasp: object leaves the world, attaches to the tool
    T_ee = _pose(0.4, 0.0, 0.10)
    scene.attach(7, T_ee)
    assert scene.world_objects() == [] and scene.attached_instance == 7
    # placement: returns to the world at the carried pose
    T_ee2 = _pose(0.1, 0.2, 0.10)
    assert scene.detach(T_ee2) == 7
    assert scene.attached_instance is None
    (obj,) = scene.world_objects()
    # carried rigidly: same cad->ee offset at the new tool pose
    assert np.allclose(obj.T_cad2world[:3, 3], [0.1, 0.2, 0.05])
    # drop: leaves the scene entirely
    scene.attach(7, _pose(0.1, 0.2, 0.10))
    scene.detach(None)
    assert scene.world_objects() == []
    scene.remove_object(7)  # no-op on absent id


def test_clearance_sign_and_static_occupancy():
    scene = _scene(ee_radius=0.0)
    scene.add_object(1, 1, _pose(0.0, 0.0, 0.0))
    r = _diag(scene, 1) / 2  # object fits in this radius
    far = scene.clearance(_pose(1.0, 0.0, 0.0))
    assert 1.0 - r <= far <= 1.0
    assert scene.clearance(_pose(0.0, 0.0, 0.0)) < far  # at the center
    assert scene.clearance(_pose(1.0, 0.0, 0.0), ignore=(1,)) == np.inf
    # occupancy voxels act as padded point obstacles
    scene2 = _scene(ee_radius=0.0)
    scene2.set_static_occupancy(np.array([[0.5, 0.0, 0.0]]), pitch=0.02)
    d = scene2.clearance(_pose(0.0, 0.0, 0.0))
    assert abs(d - (0.5 - 0.02 * np.sqrt(3) / 2)) < 1e-9


def test_motion_blocked_straight_and_lift_over():
    scene = _scene(ee_radius=0.01, min_clearance=0.005)
    scene.add_object(1, 1, _pose(0.5, 0.0, 0.0))  # wall between a and b
    r = _diag(scene, 1) / 2
    a, b = _pose(0.0, 0.0, 0.0), _pose(1.0, 0.0, 0.0)
    ok, worst = scene.check_motion(a, b)
    assert not ok and worst < scene.min_clearance
    path = scene.plan_motion(a, b)
    assert path is not None and len(path) == 3
    # lift-over: up, across above the obstacle, down to the goal
    assert path[0][2, 3] > r * 0.5 and path[1][2, 3] == path[0][2, 3]
    assert np.allclose(path[2], b)
    # straight motion with no obstacle is a single waypoint
    scene.remove_object(1)
    assert len(scene.plan_motion(a, b)) == 1


def test_goal_contact_allows_only_the_grasp_target():
    scene = _scene(ee_radius=0.01, min_clearance=0.005)
    scene.add_object(1, 1, _pose(0.5, 0.0, 0.0))  # grasp target
    scene.add_object(2, 2, _pose(0.25, 0.0, 0.0))  # bystander in the way
    # goal sinks into object 1 (suction overlap) -> contact allowed with
    # it, and the bystander forces a lift-over rather than a failure
    start = _pose(0.0, 0.0, 0.0)
    goal = _pose(0.5, 0.0, 0.0)
    path = scene.plan_motion(start, goal)
    assert path is not None
    assert np.allclose(path[-1], goal)
    # a goal inside the BYSTANDER while object 1 also blocks deep
    # approach from below stays unreachable (contact is per-target only)
    goal2 = _pose(0.25, 0.0, 0.0)
    path2 = scene.plan_motion(start, goal2)
    assert path2 is not None  # allowed contact with 2 itself
    # but passing THROUGH the bystander to a far free goal with lift
    # disabled is rejected
    assert scene.plan_motion(start, _pose(1.0, 0, 0), max_lift=0.0) is None


def test_collision_aware_robot_pick_place_cycle():
    scene = _scene(ee_radius=0.01, min_clearance=0.005)
    target_T = _pose(0.5, 0.0, 0.0)
    scene.add_object(3, 1, target_T)
    scene.add_object(4, 2, _pose(0.25, 0.0, 0.0))  # obstacle en route
    inner = SimulatedRobotInterface()
    robot = CollisionAwareRobot(
        inner, scene, T_home=_pose(0.0, 0.0, 0.0)
    )
    # approach plans around the obstacle (3 waypoints on the inner log)
    assert robot.move_to(target_T)
    moves = [e for e in inner.log if e[0] == "move_to"]
    assert len(moves) == 3
    # suction-on attaches the nearest world object
    robot.set_suction(True)
    assert scene.attached_instance == 3
    assert [o.instance_id for o in scene.world_objects()] == [4]
    # carry: the attached cloud is part of the moving body — a goal
    # whose carried-object pose collides with the bystander is rerouted
    assert robot.move_to(_pose(0.0, 0.0, 0.0))
    # release = placement at the current pose
    robot.set_suction(False)
    assert scene.attached_instance is None
    ids = sorted(o.instance_id for o in scene.world_objects())
    assert ids == [3, 4]
    (placed,) = [o for o in scene.world_objects() if o.instance_id == 3]
    assert np.allclose(placed.T_cad2world[:3, 3], [0.0, 0.0, 0.0])
    assert robot.home()
    assert np.allclose(robot.current_pose, _pose(0.0, 0.0, 0.0))


def test_update_from_poses_preserves_attached():
    scene = _scene()
    scene.add_object(1, 1, _pose(0.5, 0.0, 0.0))
    scene.attach(1, _pose(0.5, 0.0, 0.1))
    scene.update_from_poses(
        {
            1: dict(class_id=1, T_cad2world=_pose(0.5, 0.0, 0.0)),
            2: dict(class_id=2, T_cad2world=_pose(0.2, 0.0, 0.0)),
        }
    )
    # the carried object is not duplicated into the world
    assert [o.instance_id for o in scene.world_objects()] == [2]
    assert scene.attached_instance == 1
