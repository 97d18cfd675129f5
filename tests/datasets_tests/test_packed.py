"""Packed memmap store: parity with the npz loader + fast-path transform.

The packed store must be a drop-in replacement for
``RGBDPoseEstimationDatasetReIndexed`` (modulo the pack-time thresholding
of the probability grids, which the training transform performs anyway —
``transform.py:61-63``).
"""

import numpy as np
import pytest

from morefusion_tpu import datasets
from morefusion_tpu.datasets import Transform
from morefusion_tpu.training.data import BatchLoader
from morefusion_tpu.training.trainer import stack_examples


@pytest.fixture(scope="module")
def packed_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed")
    src = datasets.SyntheticRGBDPoseEstimationDataset(
        split="train", n_frames=2, n_objects=(2, 3), image_shape=(120, 160)
    )
    npz_dir = str(root / "npz")
    packed_dir = str(root / "packed")
    datasets.reindex(npz_dir, [src], n_workers=1, progress=False)
    datasets.pack_reindexed(npz_dir, packed_dir, progress=False)
    npz_ds = datasets.RGBDPoseEstimationDatasetReIndexed(npz_dir)
    packed_ds = datasets.PackedPoseDataset(packed_dir)
    return npz_ds, packed_ds


def test_packed_matches_npz(packed_pair):
    npz_ds, packed_ds = packed_pair
    assert len(npz_ds) == len(packed_ds) > 0
    for i in range(len(npz_ds)):
        a = npz_ds.get_example(i)
        b = packed_ds.get_example(i)
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["pcd"], b["pcd"])
        for k in ("grid_target", "grid_nontarget", "grid_empty"):
            np.testing.assert_array_equal(a[k] > 0.5, b[k] > 0.5)
        np.testing.assert_array_equal(
            a["grid_target_full"] > 0, b["grid_target_full"] > 0
        )
        np.testing.assert_array_equal(
            a["grid_nontarget_full"], b["grid_nontarget_full"]
        )
        assert a["class_id"] == b["class_id"]
        np.testing.assert_allclose(
            a["quaternion_true"], b["quaternion_true"]
        )
        np.testing.assert_allclose(a["pitch"], b["pitch"])


def test_transform_batch_matches_per_example(packed_pair):
    _, packed_ds = packed_pair
    n = min(len(packed_ds), 4)
    idx = list(range(n))

    raw = packed_ds.load_batch(idx)
    t_batch = Transform(train=True, with_occupancy=True, seed=7)
    out_batch = t_batch.batch(dict(raw))

    t_loop = Transform(train=True, with_occupancy=True, seed=7)
    outs = [t_loop(packed_ds.get_example(i)) for i in idx]
    out_loop = stack_examples(outs)

    for k in ("grid_target", "grid_nontarget_empty"):
        np.testing.assert_array_equal(out_batch[k], out_loop[k])
    np.testing.assert_array_equal(out_batch["pcd"], out_loop["pcd"])
    np.testing.assert_array_equal(out_batch["class_id"], out_loop["class_id"])


def test_batchloader_fast_path(packed_pair):
    _, packed_ds = packed_pair
    loader = BatchLoader(
        packed_ds,
        batch_size=2,
        transform=Transform(train=True, with_occupancy=True),
        shuffle=True,
        seed=0,
    )
    batch = next(iter(loader))
    assert batch["rgb"].dtype == np.uint8  # stays uint8 until the device
    assert batch["rgb"].shape[0] == 2
    assert batch["grid_target"].dtype == bool
    assert batch["grid_nontarget_empty"].shape == batch["grid_target"].shape
    assert np.isfinite(batch["quaternion_true"]).all()


def test_packed_visibility_filter(packed_pair):
    _, packed_ds = packed_pair
    full = len(packed_ds)
    filtered = datasets.PackedPoseDataset(
        packed_ds._root_dir, min_visibility=1.1
    )
    assert len(filtered) < full or full == 0


def test_transfer_mode_parity(packed_pair):
    """The z + affine-coef transfer form must reconstruct the organized
    cloud within the fp16/affine budget (training/transfer.py), preserve
    the NaN mask exactly, and carry z/coef instead of pcd on the batch
    fast path."""
    _, packed_ds = packed_pair
    root = packed_ds._root_dir
    datasets.derive_transfer_arrays(root, progress=False)
    tds = datasets.PackedPoseDataset(root, transfer=True)

    ex_t = tds.get_example(0)
    ex_p = packed_ds.get_example(0)
    mask = np.isfinite(ex_p["pcd"]).all(-1)
    assert (np.isfinite(ex_t["pcd"]).all(-1) == mask).all()
    err = np.abs(ex_t["pcd"] - ex_p["pcd"])[mask]
    if err.size:
        assert np.percentile(err, 99) < 5e-3
        assert err[..., 2:].max() < 1e-3  # z is fp16-exact, no affine term

    batch = tds.load_batch([0, min(1, len(tds) - 1)])
    assert "z" in batch and "pcd_coef" in batch and "pcd" not in batch
    assert batch["z"].dtype == np.float16
