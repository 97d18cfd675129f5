"""Synthetic cluttered-scene generation (physics-free, SDF-based).

Replaces the reference's pybullet scene synthesis
(``morefusion/simulation/scene_generation/base.py:10-390``,
``bin_type.py``, ``plane_type.py``): objects are placed by rejection
sampling with SDF-based collision checks (surface samples of the candidate
evaluated against placed objects' SDFs) and settled by dropping along -z
until support contact — deterministic, dependency-free, and adequate for
generating labeled RGB-D training frames. Rendering goes through the
point-splat renderer (``extra/render.py``) instead of pybullet's OpenGL.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import geometry
from ..extra.render import render_scene
from ..geometry.transform import quaternion_matrix_np


def _random_rotation(rng) -> np.ndarray:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return quaternion_matrix_np(q)


class SceneGenerationBase:
    """Spawn objects into a workspace; render labeled RGB-D frames."""

    def __init__(
        self,
        models,
        n_object: int,
        *,
        extents=(0.4, 0.4, 0.3),
        class_ids: Optional[List[int]] = None,
        random_state: Optional[np.random.RandomState] = None,
        collision_margin: float = 0.002,
    ):
        self._models = models
        self._n_object = n_object
        self._extents = np.asarray(extents, dtype=float)
        self._class_ids = class_ids or list(range(1, 22))
        self._rng = random_state or np.random.RandomState(0)
        self._margin = collision_margin

        #: instance_id -> dict(class_id, T_cad2world)
        self.objects: Dict[int, dict] = {}

    # -- placement ------------------------------------------------------

    def _support_height(self, points_world: np.ndarray) -> float:
        """z offset needed so the object rests on plane / placed objects."""
        # plane support: lowest point at z = 0
        dz_plane = -points_world[:, 2].min()
        dz = dz_plane
        return dz

    def _is_colliding(self, points_world: np.ndarray) -> bool:
        for obj in self.objects.values():
            shape = self._models.get_shape(obj["class_id"])
            T = obj["T_cad2world"]
            R, t = T[:3, :3], T[:3, 3]
            local = (points_world - t) @ R
            if (shape.sdf(local) < self._margin).any():
                return True
        return False

    def _is_contained(self, points_world: np.ndarray) -> bool:
        half = self._extents / 2.0
        lo = np.array([-half[0], -half[1], 0.0])
        hi = np.array([half[0], half[1], self._extents[2]])
        contained = ((points_world >= lo) & (points_world <= hi)).all(axis=1)
        return contained.mean() > 0.95

    def generate(self, max_trials_per_object: int = 30) -> None:
        instance_id = 0
        for _ in range(self._n_object):
            class_id = int(self._rng.choice(self._class_ids))
            shape = self._models.get_shape(class_id)
            surface = shape.sample_surface(
                500, np.random.RandomState(class_id)
            )
            for _trial in range(max_trials_per_object):
                T = _random_rotation(self._rng)
                half = self._extents / 2.0 * 0.7
                T[:2, 3] = self._rng.uniform(-half[:2], half[:2])
                T[2, 3] = self._rng.uniform(0.0, self._extents[2] * 0.5)

                pts = surface @ T[:3, :3].T + T[:3, 3]
                # settle: drop onto the plane
                T[2, 3] += self._support_height(pts)
                pts = surface @ T[:3, :3].T + T[:3, 3]

                if self._is_colliding(pts):
                    continue
                if not self._is_contained(pts):
                    continue
                self.objects[instance_id] = dict(
                    class_id=class_id, T_cad2world=T
                )
                instance_id += 1
                break

    # -- cameras ---------------------------------------------------------

    def random_camera_trajectory(
        self,
        n_keypoints: int = 8,
        n_points: int = 15,
        distance=(0.6, 0.9),
        elevation=(30.0, 80.0),
    ) -> np.ndarray:
        """(n_points, 4, 4) smooth camera path looking at the workspace.

        Reference: sphere-sampled keypoints, greedy KD sort, spline
        interpolation (``scene_generation/base.py:352+``).
        """
        rng = self._rng
        eyes = geometry.points_from_angles(
            rng.uniform(*distance, n_keypoints),
            rng.uniform(*elevation, n_keypoints),
            rng.uniform(-180, 180, n_keypoints),
        )
        eyes = geometry.trajectory.sort(eyes)
        eyes = geometry.trajectory.interpolate(eyes, n_points)
        target = np.array([0.0, 0.0, 0.1])
        return np.stack([geometry.look_at(e, target) for e in eyes])

    # -- rendering --------------------------------------------------------

    def render_frame(
        self,
        T_cam2world: np.ndarray,
        K: Optional[np.ndarray] = None,
        shape=(480, 640),
        n_points_per_object: int = 30000,
    ) -> dict:
        """Render a labeled frame from a camera pose.

        Returns the dataset-factory frame contract
        (``rgbd_pose_estimation/base.py:get_frame``): rgb, depth,
        instance_label (-1 background), instance_ids, class_ids,
        intrinsic_matrix, T_cam2world, Ts_cad2cam.
        """
        H, W = shape
        if K is None:
            f = 0.6 * W
            K = np.array(
                [[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]
            )
        T_world2cam = np.linalg.inv(T_cam2world)

        instance_ids = sorted(self.objects.keys())
        class_ids = [self.objects[i]["class_id"] for i in instance_ids]
        Ts_cad2cam = [
            T_world2cam @ self.objects[i]["T_cad2world"]
            for i in instance_ids
        ]
        out = render_scene(
            self._models,
            class_ids,
            Ts_cad2cam,
            K,
            (H, W),
            instance_ids=instance_ids,
            n_points_per_object=n_points_per_object,
        )
        return dict(
            rgb=out["rgb"],
            depth=out["depth"],
            instance_label=out["instance_label"],
            instance_ids=np.asarray(instance_ids, dtype=np.int32),
            class_ids=np.asarray(class_ids, dtype=np.int32),
            intrinsic_matrix=K,
            T_cam2world=T_cam2world,
            Ts_cad2cam=np.stack(Ts_cad2cam) if Ts_cad2cam else np.zeros((0, 4, 4)),
        )


class PlaneTypeSceneGeneration(SceneGenerationBase):
    """Objects resting on an open plane."""


class BinTypeSceneGeneration(SceneGenerationBase):
    """Objects inside a bin: tighter containment, walls block the view."""

    def _is_contained(self, points_world: np.ndarray) -> bool:
        half = self._extents / 2.0
        lo = np.array([-half[0], -half[1], 0.0])
        hi = np.array([half[0], half[1], self._extents[2]])
        return bool(((points_world >= lo) & (points_world <= hi)).all())
