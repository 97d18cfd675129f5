"""Single-buffer transfer: pack/unpack roundtrip, pcd reconstruction,
coef-consistent mask augmentation (training/transfer.py,
datasets/rgbd_pose_estimation/augmentation.py::augment_mask_z)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from morefusion_tpu.datasets.rgbd_pose_estimation.augmentation import (  # noqa: E402,E501
    augment_mask_z,
)
from morefusion_tpu.training.transfer import (  # noqa: E402
    TransferSchema,
    fit_pcd_coefs,
    reconstruct_pcd,
)


def _example_batch(B=4, H=16, V=8, rng=None):
    rng = rng or np.random.RandomState(0)
    return dict(
        rgb=rng.randint(0, 255, (B, H, H, 3)).astype(np.uint8),
        z=(rng.rand(B, H, H) + 0.3).astype(np.float16),
        pcd_coef=rng.randn(B, 4).astype(np.float32),
        grid_target=rng.rand(B, V, V, V) > 0.5,
        grid_nontarget_empty=rng.rand(B, V, V, V) > 0.5,
        class_id=rng.randint(0, 21, (B,)).astype(np.int32),
        quaternion_true=rng.randn(B, 4).astype(np.float32),
        translation_true=rng.randn(B, 3).astype(np.float32),
        origin=rng.randn(B, 3).astype(np.float32),
        pitch=rng.rand(B).astype(np.float32),
    )


def test_pack_unpack_roundtrip():
    batch = _example_batch()
    # constant-chroma rgb: 4:2:0 subsampling is then lossless up to the
    # YCrCb matrix rounding
    batch["rgb"][..., 0] = 180
    batch["rgb"][..., 1] = 90
    batch["rgb"][..., 2] = 40
    schema = TransferSchema(batch)
    buf = schema.pack(batch)
    assert buf.dtype == np.uint8 and buf.shape == (4, schema.row_bytes)
    out = jax.jit(schema.unpack)(buf)
    for k, v in batch.items():
        o = np.asarray(out[k])
        assert o.shape == v.shape, k
        if k == "rgb":
            assert o.dtype == np.float32
            assert np.abs(o - v).max() < 3.0  # matrix + rounding
        elif k == "z":
            assert o.dtype == np.float32
            zt = v.astype(np.float32)
            span = float(zt.max() - zt.min())
            assert np.abs(o - zt).max() < span / 254 + 1e-3
        else:
            assert o.dtype == v.dtype, k
            assert np.array_equal(o, v), k


def test_q8_preserves_nan_holes():
    batch = _example_batch()
    z = batch["z"].astype(np.float32)
    z[0, :4] = np.nan
    z[2] = np.nan  # fully-masked example must not divide by zero
    batch["z"] = z.astype(np.float16)
    schema = TransferSchema(batch)
    out = jax.jit(schema.unpack)(schema.pack(batch))
    o = np.asarray(out["z"])
    assert np.isnan(o[0, :4]).all()
    assert np.isnan(o[2]).all()
    assert np.isfinite(o[1]).all()


def test_yuv420_fidelity_on_natural_image():
    """Smooth (natural-image-like) content survives chroma subsampling
    within a few counts — far inside the photometric-augmentation jitter."""
    rng = np.random.RandomState(5)
    H = 32
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / H
    rgb = np.stack(
        [
            120 + 80 * np.sin(3 * yy) * np.cos(2 * xx),
            100 + 60 * yy,
            90 + 70 * xx,
        ],
        axis=-1,
    ).astype(np.uint8)[None]
    batch = _example_batch(B=1, H=H)
    batch["rgb"] = rgb
    schema = TransferSchema(batch)
    out = np.asarray(jax.jit(schema.unpack)(schema.pack(batch))["rgb"])
    assert np.abs(out - rgb).mean() < 2.0
    assert np.abs(out - rgb).max() < 12.0


def test_schema_skips_absent_fields():
    batch = _example_batch()
    batch.pop("grid_target")
    batch.pop("grid_nontarget_empty")
    schema = TransferSchema(batch)
    out = jax.jit(schema.unpack)(schema.pack(batch))
    assert "grid_target" not in out
    z = np.asarray(out["z"])
    zt = batch["z"].astype(np.float32)
    assert np.abs(z - zt).max() < float(zt.max() - zt.min()) / 254 + 1e-3


def _affine_pcd(B=3, H=24, rng=None):
    """Synthetic organized clouds with pinhole-scale affine geometry:
    b = 1/fx is a few 1e-3 per pixel for any real camera crop — the
    snapping error of nearest-resize recenterize scales with b, so
    realistic slopes matter (measured real-data bound: 2.5 mm)."""
    rng = rng or np.random.RandomState(1)
    z = (rng.rand(B, H, H) * 0.4 + 0.4).astype(np.float32)
    jj = np.arange(H, dtype=np.float32)
    ii = np.arange(H, dtype=np.float32)
    coef = np.stack(
        [
            rng.uniform(-0.4, 0.0, B),
            rng.uniform(2e-3, 8e-3, B),
            rng.uniform(-0.4, 0.0, B),
            rng.uniform(2e-3, 8e-3, B),
        ],
        axis=1,
    ).astype(np.float32)
    x = z * (coef[:, 0, None, None] + coef[:, 1, None, None] * jj)
    y = z * (coef[:, 2, None, None] + coef[:, 3, None, None] * ii[:, None])
    return np.stack([x, y, z], -1), coef


def test_fit_and_reconstruct():
    pcd, coef_true = _affine_pcd()
    pcd[0, :5] = np.nan  # holes must not break the fit
    coef = fit_pcd_coefs(pcd)
    assert np.allclose(coef, coef_true, atol=1e-4)
    rec = np.asarray(reconstruct_pcd(jnp.asarray(pcd[..., 2]), coef))
    m = np.isfinite(pcd).all(-1)
    assert np.abs(rec - pcd)[m].max() < 1e-5
    assert np.isnan(rec[0, :5]).all()


def test_augment_mask_z_keeps_reconstruction_consistent():
    """After truncate+recenterize, the updated coefs must still map the
    augmented z image onto geometry consistent with augmenting the full
    xyz cloud (within the ~1 px nearest-resize snap)."""
    pcd, _ = _affine_pcd(B=1, H=64)
    pcd = pcd[0]
    # puncture the border so the mask is non-trivial
    pcd[:8] = np.nan
    pcd[:, :6] = np.nan
    z = pcd[..., 2].astype(np.float16)
    coef = fit_pcd_coefs(pcd[None])[0]
    rgb = np.zeros(pcd.shape[:2] + (3,), np.uint8)

    rng = np.random.RandomState(3)
    _, z_aug, coef_aug = augment_mask_z(rgb, z, coef, rng)
    assert z_aug.dtype == np.float16
    rec = np.asarray(
        reconstruct_pcd(
            jnp.asarray(z_aug[None].astype(np.float32)), coef_aug[None]
        )
    )[0]
    valid = np.isfinite(z_aug.astype(np.float32))
    assert valid.any()
    # the recenterize zooms in: pixel pitch shrinks, so |b| grows
    # whenever a crop happened; reconstruction must stay finite & smooth
    assert np.isfinite(rec[valid]).all()
    # x/z must still be affine in j on every row (max residual ~ grid snap)
    xs = rec[..., 0] / rec[..., 2]
    for i in range(0, 64, 16):
        row = xs[i][valid[i]]
        cols = np.nonzero(valid[i])[0]
        if len(row) < 8:
            continue
        fit = np.polyfit(cols, row, 1)
        resid = np.abs(np.polyval(fit, cols) - row).max()
        assert resid < 8e-3  # ~1 px snap at b <= 8e-3/px


def test_augment_mask_z_geometry_matches_pcd_augmentation():
    """Same RNG draw through augment_mask (xyz) and augment_mask_z must
    give point-wise matching geometry up to the fp16 + affine error."""
    from morefusion_tpu.datasets.rgbd_pose_estimation.augmentation import (
        augment_mask,
    )

    pcd, _ = _affine_pcd(B=1, H=64)
    pcd = pcd[0]
    pcd[:10] = np.nan
    rgb = np.zeros(pcd.shape[:2] + (3,), np.uint8)
    coef = fit_pcd_coefs(pcd[None])[0]
    z = pcd[..., 2].astype(np.float16)

    _, pcd_aug = augment_mask(rgb, pcd, np.random.RandomState(7))
    _, z_aug, coef_aug = augment_mask_z(rgb, z, coef, np.random.RandomState(7))

    rec = np.asarray(
        reconstruct_pcd(
            jnp.asarray(z_aug[None].astype(np.float32)), coef_aug[None]
        )
    )[0]
    both = np.isfinite(pcd_aug).all(-1) & np.isfinite(rec).all(-1)
    # masks can differ by a 1-px resize boundary; require bulk agreement
    assert both.sum() > 0.8 * np.isfinite(pcd_aug).all(-1).sum()
    err = np.abs(rec - pcd_aug)[both]
    assert np.percentile(err, 95) < 5e-3
