"""YCB-Video data_syn split + ConcatDataset mixing.

Fabricates a mini YCB_Video_Dataset layout on disk (both ``data`` and
``data_syn``) and checks the loaders against it — the environment has no
real YCB-Video download (reference:
``morefusion/datasets/ycb_video/synthetic_dataset.py:1-23``).
"""

import os

import numpy as np
import pytest

from morefusion_tpu import datasets


def _write_frame(base, n_objects=2, seed=0):
    import imageio.v2 as imageio
    import scipy.io

    rng = np.random.RandomState(seed)
    H, W = 48, 64
    rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    depth = rng.randint(5000, 15000, (H, W)).astype(np.uint16)
    label = np.zeros((H, W), np.uint8)
    cls = rng.choice(np.arange(1, 22), n_objects, replace=False)
    for i, c in enumerate(cls):
        label[(i + 1) * 10 : (i + 1) * 10 + 8, 10:30] = c
    poses = np.zeros((3, 4, n_objects))
    for i in range(n_objects):
        poses[:, :3, i] = np.eye(3)
        poses[:, 3, i] = [0, 0, 0.7]
    os.makedirs(os.path.dirname(base), exist_ok=True)
    imageio.imwrite(base + "-color.png", rgb)
    imageio.imwrite(base + "-depth.png", depth)
    imageio.imwrite(base + "-label.png", label)
    scipy.io.savemat(
        base + "-meta.mat",
        {
            "cls_indexes": cls.astype(np.int32),
            "factor_depth": 10000.0,
            "intrinsic_matrix": np.array(
                [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]
            ),
            "poses": poses,
        },
    )


@pytest.fixture(scope="module")
def mini_ycb(tmp_path_factory):
    root = tmp_path_factory.mktemp("YCB_Video_Dataset")
    os.makedirs(root / "image_sets", exist_ok=True)
    ids = ["0001/000001", "0001/000002"]
    with open(root / "image_sets" / "train.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    for k, id_ in enumerate(ids):
        _write_frame(str(root / "data" / id_), seed=k)
    for k in range(3):
        _write_frame(str(root / "data_syn" / f"{k:06d}"), seed=10 + k)
    return str(root)


def test_real_split_loads(mini_ycb):
    ds = datasets.YCBVideoDataset("train", root_dir=mini_ycb)
    assert len(ds) == 2
    frame = ds[0]
    assert frame["rgb"].shape == (48, 64, 3)
    assert np.isnan(frame["depth"]).sum() == 0
    assert frame["class_ids"].ndim == 1


def test_data_syn_split_loads(mini_ycb):
    ds = datasets.YCBVideoSyntheticDataset(root_dir=mini_ycb)
    assert ds.split == "syn"
    assert len(ds) == 3
    frame = ds[1]
    assert frame["rgb"].shape == (48, 64, 3)
    assert (frame["class_ids"] >= 1).all()


def test_data_syn_missing_raises(tmp_path):
    with pytest.raises(IOError):
        datasets.YCBVideoSyntheticDataset(root_dir=str(tmp_path))


def test_syn_factory_split(mini_ycb):
    ds = datasets.YCBVideoRGBDPoseEstimationDataset(
        "syn", models=datasets.ProceduralModels(), root_dir=mini_ycb
    )
    assert len(ds) == 3


def test_concat_dataset_order_and_fastpath(tmp_path):
    src = datasets.SyntheticRGBDPoseEstimationDataset(
        split="train", n_frames=2, n_objects=(2, 2), image_shape=(96, 128)
    )
    npz_dir = str(tmp_path / "npz")
    packed_dir = str(tmp_path / "packed")
    datasets.reindex(npz_dir, [src], n_workers=1, progress=False)
    datasets.pack_reindexed(npz_dir, packed_dir, progress=False)
    a = datasets.PackedPoseDataset(packed_dir)
    b = datasets.PackedPoseDataset(packed_dir)
    cat = datasets.ConcatDataset(a, b)
    assert len(cat) == 2 * len(a)
    # second copy starts at offset len(a)
    ex = cat.get_example(len(a))
    ex0 = a.get_example(0)
    np.testing.assert_array_equal(ex["rgb"], ex0["rgb"])
    # fast path merges children in request order
    idx = [len(a), 0, len(a) + 1]
    batch = cat.load_batch(idx)
    np.testing.assert_array_equal(batch["rgb"][0], a.get_example(0)["rgb"])
    np.testing.assert_array_equal(batch["rgb"][1], a.get_example(0)["rgb"])
    np.testing.assert_array_equal(batch["rgb"][2], a.get_example(1)["rgb"])

    sub = datasets.RandomSamplingDataset(a, 2, seed=1)
    cat2 = datasets.ConcatDataset(a, sub)
    batch2 = cat2.load_batch(np.arange(len(a) + 2))
    assert batch2["rgb"].shape[0] == len(a) + 2
