"""Device-side crop/centerize parity with the host preprocessing.

The serving pipeline fuses per-instance mask+crop+centerize into the pose
jit (``runtime/pose_estimation.py::_crop_instance_device``); the host twin
below (cv2 mask+crop+centerize, matching the reference node's
``singleview_3d_pose_estimation.py:158-241`` preprocessing) is the oracle.
"""

import jax
import numpy as np

from morefusion_tpu.extra.image import centerize
from morefusion_tpu.geometry.bbox import masks_to_bboxes
from morefusion_tpu.runtime.pose_estimation import _crop_instance_device


def _host_crop(rgb, pcd, mask, size):
    y1, x1, y2, x2 = masks_to_bboxes(mask).round().astype(int)
    pcd_ins = pcd.copy()
    pcd_ins[~mask] = np.nan
    pcd_ins = centerize(
        pcd_ins[y1:y2, x1:x2], (size, size), cval=np.nan,
        interpolation="nearest",
    )
    rgb_ins = rgb.copy()
    rgb_ins[~mask] = 0
    rgb_ins = centerize(rgb_ins[y1:y2, x1:x2], (size, size))
    return rgb_ins, pcd_ins, (y1, x1, y2, x2)


def test_device_crop_matches_host():
    rng = np.random.RandomState(0)
    H, W, S = 120, 160, 64
    rgb = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
    pcd = rng.rand(H, W, 3).astype(np.float32)
    pcd[rng.rand(H, W) < 0.2] = np.nan
    label = np.full((H, W), -1, np.int32)
    label[20:75, 30:110] = 3
    label[50:60, 90:140] = 7  # overlapping second instance

    crop = jax.jit(
        lambda i, b: _crop_instance_device(
            rgb, pcd, label, i, b, S
        )
    )

    for ins_id in (3, 7):
        mask = label == ins_id
        rgb_h, pcd_h, bbox = _host_crop(
            rgb.astype(np.float32), pcd, mask, S
        )
        rgb_d, pcd_d = crop(
            np.int32(ins_id), np.asarray(bbox, np.int32)
        )
        rgb_d = np.asarray(rgb_d)
        pcd_d = np.asarray(pcd_d)

        # pcd: nearest-neighbour resample must match exactly (same
        # cv2 INTER_NEAREST index arithmetic), NaN pattern included
        np.testing.assert_array_equal(
            np.isnan(pcd_d), np.isnan(pcd_h)
        )
        ok = ~np.isnan(pcd_h).any(axis=2)
        np.testing.assert_allclose(
            pcd_d[ok], pcd_h[ok], rtol=0, atol=1e-6
        )

        # rgb: bilinear against cv2 INTER_LINEAR (fixed-point in cv2,
        # float on device) — allow ~2/255 quantization slack on >99% of
        # pixels and a loose bound elsewhere
        diff = np.abs(rgb_d - rgb_h)
        assert np.mean(diff <= 2.0) > 0.99, np.mean(diff <= 2.0)
        assert np.percentile(diff, 99.9) <= 64.0


def test_device_crop_degenerate_thin_box():
    rng = np.random.RandomState(1)
    H, W, S = 48, 64, 32
    rgb = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
    pcd = rng.rand(H, W, 3).astype(np.float32)
    label = np.full((H, W), -1, np.int32)
    label[10:12, 5:40] = 2  # 2-pixel-tall strip

    mask = label == 2
    rgb_h, pcd_h, bbox = _host_crop(rgb.astype(np.float32), pcd, mask, S)
    rgb_d, pcd_d = jax.jit(
        lambda i, b: _crop_instance_device(rgb, pcd, label, i, b, S)
    )(np.int32(2), np.asarray(bbox, np.int32))
    np.testing.assert_array_equal(
        np.isnan(np.asarray(pcd_d)), np.isnan(pcd_h)
    )
