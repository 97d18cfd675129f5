"""Pick-and-place planning (layer L11, hardware-agnostic).

The reference's robot layer (``ros/src/morefusion_ros/ri/pick_and_place.py``
+ MoveIt C++ services) is a scripted state machine over ROS/MoveIt. Here
the *planning* logic (scan poses, picking order, suction grasps, waypoint
sequences) is a pure library; execution goes through a ``RobotInterface``
adapter — a ROS/MoveIt binding implements ``move_to``/``set_suction``
against hardware, and ``SimulatedRobotInterface`` records the sequence for
tests and dry runs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import geometry
from .picking import (
    build_occlusion_graph,
    select_picking_order,
    suction_grasp_pose,
)


@dataclasses.dataclass
class PickAction:
    instance_id: int
    class_id: int
    grasp_pose: np.ndarray  # (4, 4) end-effector pose at contact
    pre_grasp_pose: np.ndarray  # approach waypoint
    lift_pose: np.ndarray  # post-grasp retreat
    place_pose: Optional[np.ndarray] = None


class RobotInterface:
    """Execution adapter contract (ROS/MoveIt binding or simulator)."""

    def move_to(self, T_ee2world: np.ndarray, speed: float = 1.0) -> bool:
        raise NotImplementedError

    def set_suction(self, on: bool) -> None:
        raise NotImplementedError

    def home(self) -> bool:
        raise NotImplementedError


class SimulatedRobotInterface(RobotInterface):
    """Records commands; always succeeds (test/dry-run adapter)."""

    def __init__(self):
        self.log: List = []

    def move_to(self, T_ee2world, speed=1.0):
        self.log.append(("move_to", np.asarray(T_ee2world), speed))
        return True

    def set_suction(self, on):
        self.log.append(("suction", bool(on)))

    def home(self):
        self.log.append(("home",))
        return True


class PickAndPlacePlanner:
    def __init__(
        self,
        models,
        pre_grasp_offset: float = 0.05,
        lift_offset: float = 0.10,
        grasp_overlap: float = 0.01,  # reference ri/pick_and_place.py
    ):
        self._models = models
        self._pre = pre_grasp_offset
        self._lift = lift_offset
        self._overlap = grasp_overlap

    def scan_poses(
        self, n: int = 7, distance=(0.5, 0.7), rng=None
    ) -> np.ndarray:
        """Camera scan poses over the workspace (the reference's scanning
        motion, ``_define_robot_poses``)."""
        rng = rng or np.random.RandomState(0)
        m = n + 1  # trajectory.sort drops the last point (reference quirk)
        eyes = geometry.points_from_angles(
            rng.uniform(*distance, m),
            rng.uniform(45, 80, m),
            np.linspace(-120, 120, m),
        )
        eyes = geometry.trajectory.sort(eyes)
        return np.stack(
            [geometry.look_at(e, np.zeros(3)) for e in eyes]
        )

    def plan_grasp(self, class_id: int, T_cad2world: np.ndarray):
        """Suction grasp for one object at its estimated pose."""
        shape = None
        if hasattr(self._models, "get_shape"):
            shape = self._models.get_shape(class_id)
        pcd = self._models.get_pcd(class_id)
        if shape is not None:
            normals = shape.normals(pcd.astype(np.float64))
        else:  # real meshes: radial normals fallback
            c = pcd.mean(axis=0)
            normals = pcd - c
            normals /= np.linalg.norm(normals, axis=1, keepdims=True) + 1e-12
        R, t = T_cad2world[:3, :3], T_cad2world[:3, 3]
        pts_w = pcd @ R.T + t
        n_w = normals @ R.T
        T = suction_grasp_pose(pts_w, n_w, up=(0, 0, 1))
        if T is None:
            return None
        # sink by the suction overlap (reference grasp_overlap = 1 cm)
        T = T.copy()
        T[:3, 3] += T[:3, 2] * self._overlap
        return T

    def plan_picks(
        self,
        poses: Dict[int, dict],  # instance_id -> {class_id, T_cad2world}
        K: np.ndarray,
        T_cam2world: np.ndarray,
        image_shape,
        target_instance: Optional[int] = None,
        place_poses: Optional[Dict[int, np.ndarray]] = None,
    ) -> List[PickAction]:
        """Occlusion-ordered pick plan reaching the target instance."""
        ids = sorted(poses.keys())
        if not ids:
            return []
        class_ids = [poses[i]["class_id"] for i in ids]
        T_w2c = np.linalg.inv(T_cam2world)
        Ts_cam = [T_w2c @ poses[i]["T_cad2world"] for i in ids]

        occluded_by = build_occlusion_graph(
            self._models, class_ids, Ts_cam, K, image_shape
        )
        target_idx = (
            ids.index(target_instance)
            if target_instance is not None
            else 0
        )
        order = select_picking_order(occluded_by, target_idx)

        plan = []
        for k in order:
            ins_id = ids[k]
            T_cad2world = poses[ins_id]["T_cad2world"]
            grasp = self.plan_grasp(class_ids[k], T_cad2world)
            if grasp is None:
                continue
            pre = grasp.copy()
            pre[:3, 3] -= grasp[:3, 2] * self._pre
            lift = grasp.copy()
            lift[2, 3] += self._lift
            plan.append(
                PickAction(
                    instance_id=ins_id,
                    class_id=class_ids[k],
                    grasp_pose=grasp,
                    pre_grasp_pose=pre,
                    lift_pose=lift,
                    place_pose=(place_poses or {}).get(ins_id),
                )
            )
        return plan

    def execute(
        self, plan: Sequence[PickAction], robot: RobotInterface
    ) -> bool:
        """Run the pick sequence through an adapter (the reference's
        state-machine loop)."""
        for action in plan:
            if not robot.move_to(action.pre_grasp_pose):
                return False
            if not robot.move_to(action.grasp_pose, speed=0.3):
                return False
            robot.set_suction(True)
            if not robot.move_to(action.lift_pose, speed=0.5):
                return False
            if action.place_pose is not None:
                if not robot.move_to(action.place_pose):
                    return False
            robot.set_suction(False)
        robot.home()
        return True
