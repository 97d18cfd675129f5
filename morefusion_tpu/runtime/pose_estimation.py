"""Pose-estimation node: instance crops -> SingleView3D -> poses (+ICP).

Port of the reference's ``singleview_3d_pose_estimation`` node
(``ros/src/morefusion_ros/nodes/singleview_3d_pose_estimation.py:27-288``):
crop+centerize each detected instance to 256^2, batch through the
volumetric model with its no-entry grid, take the max-confidence
per-point pose, optionally refine per object with ICP against the
observed depth points.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..contrib.icp import ICPRegistration
from ..functions import transformation_matrix
from ..geometry.bbox import masks_to_bboxes


def _crop_instance_device(
    rgb_frame, pcd_frame, label, ins_id, bbox, image_size: int
):
    """Device-side equivalent of the host mask+crop+centerize preprocessing.

    Reproduces the reference node's per-instance steps
    (``singleview_3d_pose_estimation.py:158-241``): mask the frame to the
    instance, crop its bbox, aspect-preserving resize to ``image_size``²
    with center padding (cv2 conventions: INTER_LINEAR for rgb, whose
    off-mask pixels are zeroed first; INTER_NEAREST for the NaN-holed
    cloud). Runs inside the pose jit so the host ships one full frame
    instead of per-instance float32 crops (~4x fewer bytes through the
    host->device link, and no per-instance host work).
    """
    S = image_size
    rgb_frame = jnp.asarray(rgb_frame)
    pcd_frame = jnp.asarray(pcd_frame)
    label = jnp.asarray(label)
    y1, x1, y2, x2 = bbox[0], bbox[1], bbox[2], bbox[3]
    Hb = (y2 - y1).astype(jnp.float32)
    Wb = (x2 - x1).astype(jnp.float32)
    scale = jnp.minimum(S / Hb, S / Wb)
    h = jnp.clip(jnp.round(Hb * scale), 1, S).astype(jnp.int32)
    w = jnp.clip(jnp.round(Wb * scale), 1, S).astype(jnp.int32)
    y0 = (S - h) // 2
    x0 = (S - w) // 2

    ys = jnp.arange(S)
    xs = jnp.arange(S)
    vy = (ys >= y0) & (ys < y0 + h)
    vx = (xs >= x0) & (xs < x0 + w)
    valid = vy[:, None] & vx[None, :]

    # nearest (cv2 INTER_NEAREST): src = floor(dst * src/dst), clamped to
    # the bbox (cv2 resizes the cropped subimage, so borders clamp to it)
    sy = y1 + jnp.floor((ys - y0) * (Hb / h)).astype(jnp.int32)
    sx = x1 + jnp.floor((xs - x0) * (Wb / w)).astype(jnp.int32)
    sy = jnp.clip(sy, y1, y2 - 1)
    sx = jnp.clip(sx, x1, x2 - 1)
    lab_n = label[sy[:, None], sx[None, :]]
    mask = (lab_n == ins_id) & valid
    pcd_c = pcd_frame[sy[:, None], sx[None, :]]
    pcd_c = jnp.where(mask[..., None], pcd_c, jnp.nan)

    # bilinear rgb (cv2 INTER_LINEAR): fsrc = (dst+0.5)*src/dst - 0.5;
    # each corner contributes 0 where it falls off the instance mask
    # (host path zeroes rgb outside the mask before resizing)
    fy = (ys.astype(jnp.float32) - y0 + 0.5) * (Hb / h) - 0.5
    fx = (xs.astype(jnp.float32) - x0 + 0.5) * (Wb / w) - 0.5
    fy = jnp.clip(fy, 0.0, Hb - 1.0) + y1
    fx = jnp.clip(fx, 0.0, Wb - 1.0) + x1
    fy0 = jnp.floor(fy)
    fx0 = jnp.floor(fx)
    wy = (fy - fy0)[:, None]
    wx = (fx - fx0)[None, :]
    iy0 = fy0.astype(jnp.int32)
    ix0 = fx0.astype(jnp.int32)
    iy1 = jnp.minimum(iy0 + 1, y2 - 1)
    ix1 = jnp.minimum(ix0 + 1, x2 - 1)

    def corner(iy, ix):
        r = rgb_frame[iy[:, None], ix[None, :]].astype(jnp.float32)
        m = label[iy[:, None], ix[None, :]] == ins_id
        return r * m[..., None]

    rgb_c = (
        corner(iy0, ix0) * ((1 - wy) * (1 - wx))[..., None]
        + corner(iy0, ix1) * ((1 - wy) * wx)[..., None]
        + corner(iy1, ix0) * (wy * (1 - wx))[..., None]
        + corner(iy1, ix1) * (wy * wx)[..., None]
    )
    rgb_c = rgb_c * valid[..., None]
    return rgb_c, pcd_c


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

        def readout(quat, trans, conf):
            # best-confidence pose selection + 4x4 assembly fused into the
            # forward graph: the node previously read back the full
            # (B, P, 4/3/1) towers and built each T with an *eager*
            # transformation_matrix per instance — 2N extra host<->device
            # round trips per frame through the relay (VERDICT round 1:
            # ~10 calls/frame at 40-90 ms each)
            best = jnp.argmax(conf, axis=1)
            qb = jnp.take_along_axis(
                quat, best[:, None, None], axis=1
            )[:, 0]
            tb = jnp.take_along_axis(
                trans, best[:, None, None], axis=1
            )[:, 0]
            T = jax.vmap(transformation_matrix)(qb, tb)
            return T, jnp.max(conf, axis=1)

        def predict_frame(
            params, rgb_frame, pcd_frame, label, ins_ids, bboxes,
            class_ids, pitches, grids_u8,
        ):
            # the whole per-frame pose stage as ONE device program:
            # per-instance mask+crop+centerize (see _crop_instance_device),
            # the volumetric forward, and the best-confidence pose
            # readout. Host ships one uint8 rgb frame + one float32 cloud
            # + the int32 label image + per-instance scalars; noentry
            # grids ride as uint8/255 (quantized occupancy probabilities).
            rgb_c, pcd_c = jax.vmap(
                lambda i, b: _crop_instance_device(
                    rgb_frame, pcd_frame, label, i, b, image_size
                )
            )(ins_ids, bboxes)
            kw = dict(
                class_id=class_ids, rgb=rgb_c, pcd=pcd_c, pitch=pitches
            )
            if getattr(model, "with_occupancy", False):
                kw["grid_nontarget_empty"] = (
                    grids_u8.astype(jnp.float32) / 255.0
                )
            return readout(*model.apply(params, **kw))

        self._predict_frame = jax.jit(predict_frame)

    def estimate(
        self,
        rgb: np.ndarray,
        pcd: np.ndarray,  # camera-frame organized cloud
        instance_label: np.ndarray,
        instance_to_class: Dict[int, int],
        noentry_grids: Optional[Dict[int, np.ndarray]] = None,
    ) -> Dict[int, dict]:
        """Returns {instance_id: {'T_cad2cam', 'class_id', 'confidence'}}."""
        handle = self.dispatch(
            rgb, pcd, instance_label, instance_to_class, noentry_grids
        )
        return self.resolve(handle)

    def dispatch(
        self,
        rgb: np.ndarray,
        pcd: np.ndarray,
        instance_label: np.ndarray,
        instance_to_class: Dict[int, int],
        noentry_grids: Optional[Dict[int, np.ndarray]] = None,
    ) -> Optional[dict]:
        """Launch the frame's pose program without blocking on the result.

        JAX dispatch is asynchronous: the returned handle's device arrays
        complete in the background, so the host can run the NEXT frame's
        fusion/extraction while the device computes (resolve() reads the
        result back). This is the software-pipelined serving mode —
        reference role: the pose node consuming the camera stream
        decoupled from the mapping node (SURVEY.md §3.4).
        """
        finite = ~np.isnan(pcd).any(axis=2)
        ids, bboxes, class_ids, pitches, grids = [], [], [], [], []
        for ins_id, class_id in instance_to_class.items():
            mask = instance_label == ins_id
            if not (mask & finite).any():
                continue
            y1, x1, y2, x2 = (
                masks_to_bboxes(mask).round().astype(int)
            )
            if (y2 - y1) * (x2 - x1) == 0:
                continue
            ids.append(ins_id)
            bboxes.append((y1, x1, y2, x2))
            class_ids.append(class_id)
            pitches.append(
                self._models.get_voxel_pitch(self._voxel_dim, class_id)
            )
            if noentry_grids is not None and ins_id in noentry_grids:
                g = noentry_grids[ins_id]
                if g.dtype != np.uint8:
                    g = (
                        np.clip(g, 0.0, 1.0) * 255.0
                    ).round().astype(np.uint8)
                grids.append(g)
            else:
                grids.append(
                    np.zeros((self._voxel_dim,) * 3, np.uint8)
                )

        if not ids:
            return None

        # pad the instance batch to a power-of-two bucket: a varying
        # detection count otherwise recompiles the forward per new B
        # (padding rows repeat instance 0; their outputs are discarded)
        B = len(ids)
        Bp = 1 << (B - 1).bit_length()
        pad = [0] * (Bp - B)
        take = list(range(B)) + pad

        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb, 0, 255).astype(np.uint8)
        out = self._predict_frame(
            self._params,
            rgb,
            pcd.astype(np.float32, copy=False),
            instance_label.astype(np.int32, copy=False),
            np.asarray(ids, np.int32)[take],
            np.asarray(bboxes, np.int32)[take],
            np.asarray(class_ids, np.int32)[take],
            np.asarray(pitches, np.float32)[take],
            np.stack(grids)[take],
        )
        return dict(
            out=out,
            ids=ids,
            class_ids=class_ids,
            B=B,
            pcd=pcd,
            instance_label=instance_label,
        )

    def resolve(self, handle: Optional[dict]) -> Dict[int, dict]:
        """Read back a dispatched frame's poses (one device->host
        transfer for both outputs), then optional per-object host ICP."""
        if handle is None:
            return {}
        ids = handle["ids"]
        class_ids = handle["class_ids"]
        B = handle["B"]
        pcd = handle["pcd"]
        instance_label = handle["instance_label"]
        Ts, confs = jax.device_get(handle["out"])
        Ts = np.asarray(Ts, dtype=np.float64)[:B]
        confs = np.asarray(confs)[:B]

        results = {}
        for k, ins_id in enumerate(ids):
            T = Ts[k]
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
                confidence=float(confs[k]),
            )
        return results
