"""Hardware-binding wire contract (fake transports; no ROS needed).

Reference contracts: ``srv/MoveToPose.srv`` +
``pose_service.cpp:74-190`` (goal poses, tolerance vectors, scaling),
``ri/contrib/robot_interface2.py`` (joint homes, suction service),
``arduino/suction_controller.ino`` ('g'/'s' at 9600 baud).
"""

import numpy as np

from morefusion_tpu.geometry.transform import quaternion_matrix_np
from morefusion_tpu.runtime import (
    JOINT_POSITIONS,
    MoveItRobotInterface,
    SerialSuction,
    build_move_request,
)


class FakeTransport:
    def __init__(self, results=None):
        self.calls = []
        self.results = list(results or [])

    def _pop(self):
        return self.results.pop(0) if self.results else True

    def move_to_pose(self, req):
        self.calls.append(("pose", req))
        return self._pop()

    def move_to_joint_position(self, joints, speed):
        self.calls.append(("joints", tuple(joints), speed))
        return self._pop()

    def set_suction(self, on):
        self.calls.append(("suction", on))
        return True


class FakePort:
    def __init__(self):
        self.written = b""

    def write(self, data):
        self.written += data


def _pose(x, y, z, R=None):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = [x, y, z]
    return T


def test_build_move_request_wire_fields():
    q = np.array([0.5, 0.5, 0.5, 0.5])  # w, x, y, z — a 120deg rotation
    R = quaternion_matrix_np(q)[:3, :3]
    req = build_move_request(_pose(0.4, -0.1, 0.3, R), speed=0.3)
    (goal,) = req["goal_poses"]
    assert goal["position"] == (0.4, -0.1, 0.3)
    # ROS wire order x, y, z, w (sign may flip: q and -q are equal)
    got = np.array(goal["orientation"])
    want = np.array([0.5, 0.5, 0.5, 0.5])
    assert np.allclose(got, want) or np.allclose(got, -want)
    assert req["position_constraints"] == [(0.01,) * 3]
    assert req["orientation_constraints"] == [(0.05,) * 3]
    assert req["velocity_scaling"] == req["acceleration_scaling"] == 0.3
    assert req["link_name"] == "panda_suction_cup"
    assert req["avoid_collisions"] is True
    assert not req["pure_translation"] and not req["pure_rotation"]
    # speed is clamped to MoveIt's (0, 1] scaling range
    assert build_move_request(np.eye(4), speed=7.0)["velocity_scaling"] == 1.0


def test_interface_routes_moves_suction_and_home():
    t = FakeTransport(results=[True, False])
    robot = MoveItRobotInterface(transport=t, home_pose="overlook")
    assert robot.move_to(_pose(0.5, 0.0, 0.2), speed=0.3)
    assert not robot.move_to(_pose(0.9, 0.0, 0.2))  # planner failure
    robot.set_suction(True)
    robot.set_suction(False)
    assert robot.check_grasped()  # no pressure sensor -> True
    assert robot.home()
    kinds = [c[0] for c in t.calls]
    assert kinds == ["pose", "pose", "suction", "suction", "joints"]
    assert t.calls[-1][1] == JOINT_POSITIONS["overlook"]
    assert t.calls[2][1] is True and t.calls[3][1] is False


def test_serial_suction_speaks_arduino_protocol():
    port = FakePort()
    suction = SerialSuction(port)
    robot = MoveItRobotInterface(transport=FakeTransport(), suction=suction)
    robot.set_suction(True)
    robot.set_suction(False)
    robot.set_suction(True)
    assert port.written == b"gsg"  # suction_controller.ino byte protocol


def test_pressure_sensor_gates_check_grasped():
    class SensedSuction(SerialSuction):
        ok = False

        def pressure_ok(self):
            return self.ok

    suction = SensedSuction(FakePort())
    robot = MoveItRobotInterface(transport=FakeTransport(), suction=suction)
    assert not robot.check_grasped()
    suction.ok = True
    assert robot.check_grasped()
