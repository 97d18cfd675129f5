"""Pose-estimation node: instance crops -> SingleView3D -> poses (+ICP).

Port of the reference's ``singleview_3d_pose_estimation`` node
(``ros/src/morefusion_ros/nodes/singleview_3d_pose_estimation.py:27-288``):
crop+centerize each detected instance to 256^2, batch through the
volumetric model with its no-entry grid, take the max-confidence
per-point pose, optionally refine per object with ICP against the
observed depth points.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from ..contrib.icp import ICPRegistration
from ..extra.image import centerize
from ..functions import transformation_matrix
from ..geometry.bbox import masks_to_bboxes


class PoseEstimationNode:
    def __init__(
        self,
        model,
        params,
        models,
        image_size: int = 256,
        voxel_dim: int = 32,
        with_icp: bool = False,
    ):
        self._model = model
        self._params = params
        self._models = models
        self._image_size = image_size
        self._voxel_dim = voxel_dim
        self._with_icp = with_icp

        self._predict = jax.jit(
            lambda params, **kw: model.apply(params, **kw)
        )

    def _crop_instance(self, rgb, pcd, mask):
        bbox = masks_to_bboxes(mask)
        y1, x1, y2, x2 = bbox.round().astype(int)
        if (y2 - y1) * (x2 - x1) == 0:
            return None
        pcd_ins = pcd.copy()
        pcd_ins[~mask] = np.nan
        pcd_ins = centerize(
            pcd_ins[y1:y2, x1:x2],
            (self._image_size, self._image_size),
            cval=np.nan,
            interpolation="nearest",
        )
        rgb_ins = rgb.copy()
        rgb_ins[~mask] = 0
        rgb_ins = centerize(
            rgb_ins[y1:y2, x1:x2], (self._image_size, self._image_size)
        )
        return rgb_ins, pcd_ins

    def estimate(
        self,
        rgb: np.ndarray,
        pcd: np.ndarray,  # camera-frame organized cloud
        instance_label: np.ndarray,
        instance_to_class: Dict[int, int],
        noentry_grids: Optional[Dict[int, np.ndarray]] = None,
    ) -> Dict[int, dict]:
        """Returns {instance_id: {'T_cad2cam', 'class_id', 'confidence'}}."""
        ids, rgbs, pcds, class_ids, pitches, grids = [], [], [], [], [], []
        for ins_id, class_id in instance_to_class.items():
            mask = instance_label == ins_id
            if not mask.any():
                continue
            crop = self._crop_instance(rgb, pcd, mask)
            if crop is None:
                continue
            valid = ~np.isnan(crop[1]).any(axis=2)
            if valid.sum() < 1:
                continue
            ids.append(ins_id)
            rgbs.append(crop[0])
            pcds.append(crop[1])
            class_ids.append(class_id)
            pitches.append(
                self._models.get_voxel_pitch(self._voxel_dim, class_id)
            )
            if noentry_grids is not None and ins_id in noentry_grids:
                grids.append(noentry_grids[ins_id])
            else:
                grids.append(
                    np.zeros((self._voxel_dim,) * 3, np.float32)
                )

        if not ids:
            return {}

        # pad the instance batch to a power-of-two bucket: a varying
        # detection count otherwise recompiles the forward per new B
        # (padding rows repeat instance 0; their outputs are discarded)
        B = len(ids)
        Bp = 1 << (B - 1).bit_length()
        pad = [0] * (Bp - B)
        take = list(range(B)) + pad

        batch = dict(
            class_id=np.asarray(class_ids, np.int32)[take],
            rgb=np.stack(rgbs).astype(np.float32)[take],
            pcd=np.stack(pcds).astype(np.float32)[take],
            pitch=np.asarray(pitches, np.float32)[take],
        )
        if getattr(self._model, "with_occupancy", False):
            batch["grid_nontarget_empty"] = np.stack(grids).astype(
                np.float32
            )[take]
        out = self._predict(self._params, **batch)
        # one device->host transfer for all three outputs (each separate
        # np.asarray is a full round trip — 3x the sync cost per frame)
        import jax

        quat, trans, conf = (
            np.asarray(a)[:B] for a in jax.device_get(out)
        )

        results = {}
        for k, ins_id in enumerate(ids):
            best = int(np.argmax(conf[k]))
            T = np.asarray(
                transformation_matrix(quat[k, best], trans[k, best])
            ).astype(np.float64)
            if self._with_icp:
                mask = instance_label == ins_id
                nonnan = ~np.isnan(pcd).any(axis=2)
                depth_points = pcd[mask & nonnan]
                if len(depth_points) > 10:
                    cad = self._models.get_pcd(class_ids[k])
                    reg = ICPRegistration(depth_points, cad, T)
                    T = reg.register()
            results[ins_id] = dict(
                T_cad2cam=T,
                class_id=int(class_ids[k]),
                confidence=float(conf[k, best]),
            )
        return results
