"""Tests for the data layer: assets, renderer, mapping, factory, transform."""

import numpy as np
import pytest

from morefusion_tpu import datasets
from morefusion_tpu.contrib import MultiInstanceOccupancyMapping
from morefusion_tpu.datasets import ycb_video
from morefusion_tpu.extra.image import centerize
from morefusion_tpu.extra.render import render_scene


def test_class_tables():
    assert len(ycb_video.class_names) == 22
    assert ycb_video.class_names[0] == "__background__"
    assert len(ycb_video.class_ids_symmetric) == 5
    flags = ycb_video.symmetric_flags()
    assert flags.sum() == 5
    assert flags[13 - 1]  # 024_bowl


def test_procedural_models_assets():
    m = datasets.ProceduralModels()
    for cid in range(1, 22):
        pcd = m.get_pcd(cid)
        assert pcd.shape[1] == 3 and len(pcd) > 1000
        # surface points are on the zero level set
        d = np.abs(m.get_shape(cid).sdf(pcd.astype(np.float64)))
        assert np.percentile(d, 95) < 2e-3, f"class {cid}"
        grid = m.get_solid_voxel_grid(cid)
        assert len(grid.points) > 50
        assert (grid.inside_distance >= 0).all()
        assert m.get_voxel_pitch(32, cid) > 0


def test_centerize_aspect_and_nan():
    img = np.random.rand(10, 20, 3).astype(np.float32)
    out = centerize(img, (32, 32), cval=np.nan, interpolation="nearest")
    assert out.shape == (32, 32, 3)
    assert np.isnan(out[0]).all()  # top pad
    assert not np.isnan(out[16]).any()  # center row


def test_render_scene_basic():
    m = datasets.ProceduralModels()
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    T = np.eye(4)
    T[:3, 3] = [0, 0, 0.5]
    out = render_scene(m, [2], [T], K, (240, 320), n_points_per_object=8000)
    label = out["instance_label"]
    assert (label == 0).sum() > 500  # object visible
    depth = out["depth"]
    vis = label == 0
    assert np.nanmedian(depth[vis]) == pytest.approx(0.5, abs=0.12)
    # projected color is the class color, shaded
    assert out["rgb"][vis].mean() > 10


def test_occupancy_mapping_grids():
    mapping = MultiInstanceOccupancyMapping()
    mapping.initialize(0, pitch=0.01)
    # fake organized cloud: a plane patch at z = 0.5
    H, W = 40, 40
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    pcd = np.dstack(
        [(jj - 20) * 0.005, (ii - 20) * 0.005, np.full_like(jj, 0.5, float)]
    )
    mask = np.ones((H, W), bool)
    mapping.integrate(0, mask, pcd)

    # target grid centered at the patch
    origin = np.array([-0.08, -0.08, 0.42])
    g_t, g_nt, g_e = mapping.get_target_grids(
        0, dimensions=(16, 16, 16), pitch=0.01, origin=origin
    )
    assert g_t.max() > 0.5  # surface is occupied
    assert g_e.max() > 0.5  # carving created observed-empty space
    assert g_nt.sum() == 0  # single instance
    # occupied voxels at z index ~ 8 (0.5 - 0.42 = 0.08)
    occ_z = np.argwhere(g_t > 0.5)[:, 2]
    assert np.abs(occ_z - 8).max() <= 1
    # empty voxels are in front of the surface (smaller z)
    empty_z = np.argwhere(g_e > 0.5)[:, 2]
    assert empty_z.mean() < occ_z.mean()

    occupied, empty = mapping.get_target_pcds(0)
    assert len(occupied) > 0 and len(empty) > 0


def test_synthetic_dataset_examples():
    ds = datasets.SyntheticRGBDPoseEstimationDataset(
        n_frames=2, image_shape=(120, 160), n_points_per_object=4000,
        n_objects=(2, 3),
    )
    examples = ds.get_example(0)
    assert len(examples) >= 1
    e = examples[0]
    assert e["rgb"].shape == (256, 256, 3)
    assert e["pcd"].shape == (256, 256, 3)
    assert e["grid_target"].shape == (32, 32, 32)
    assert 0 < e["visibility"] <= 1.5
    assert np.isfinite(e["pcd"][~np.isnan(e["pcd"])]).all()
    # pose roundtrip: quaternion/translation reproduce points near pcd
    assert np.linalg.norm(e["translation_true"]) < 3.0


def test_transform_cases():
    ds = datasets.SyntheticRGBDPoseEstimationDataset(
        n_frames=1, image_shape=(120, 160), n_points_per_object=4000,
        n_objects=(2, 2),
    )
    e = ds.get_example(0)[0]

    tr_eval = datasets.Transform(train=False, with_occupancy=True)
    out = tr_eval(dict(e))
    assert out["grid_target"].dtype == bool
    assert out["grid_nontarget_empty"].dtype == bool
    # eval case is empty+nontarget with the reference's XOR algebra
    # (train.py:51-54): gne = (nontarget ^ target) | (empty ^ target)
    g_t = e["grid_target"] > 0.5
    expected = ((e["grid_nontarget"] > 0.5) ^ g_t) | (
        (e["grid_empty"] > 0.5) ^ g_t
    )
    np.testing.assert_array_equal(out["grid_nontarget_empty"], expected)

    tr_plain = datasets.Transform(train=True, with_occupancy=False)
    out2 = tr_plain(dict(e))
    assert "grid_target" not in out2
    # pitch/origin stay (our SingleView3D takes them as explicit inputs)
    assert "pitch" in out2 and "origin" in out2


def test_reindex_roundtrip(tmp_path):
    ds = datasets.SyntheticRGBDPoseEstimationDataset(
        n_frames=1, image_shape=(120, 160), n_points_per_object=4000,
        n_objects=(2, 2),
    )
    meta = datasets.reindex(str(tmp_path), [ds], n_workers=1, progress=False)
    assert len(meta) >= 1

    # rebuild_meta reconstructs the index from the npz files alone
    # (recovery path for generation runs cut short before meta.json)
    import os

    os.remove(tmp_path / "meta.json")
    rebuilt = datasets.rebuild_meta(str(tmp_path), drop_last_frame=False)
    assert rebuilt == meta

    loaded = datasets.RGBDPoseEstimationDatasetReIndexed(
        str(tmp_path), split="train"
    )
    assert len(loaded) == len(meta)
    ex = loaded[0]
    assert ex["rgb"].shape == (256, 256, 3)
    assert "visibility" not in ex

    aug = datasets.RGBDPoseEstimationDatasetReIndexed(
        str(tmp_path), split="train", augmentation=True
    )
    ex2 = aug[0]
    assert ex2["rgb"].shape == (256, 256, 3)
    assert ex2["pcd"].dtype == np.float32


def test_textured_point_colors_break_symmetry():
    """The procedural texture must be deterministic, canonical-frame
    (rigidly attached), and must DISTINGUISH rotations that the shape
    alone cannot — the whole point of the textured bank (ROUND4.md 1b:
    orientation is undecidable from flat-color renders of
    near-symmetric solids)."""
    m = datasets.ProceduralModels(textured=True)
    assert m.textured
    pts = m.get_pcd(1).astype(np.float64)  # master_chef_can (cylinder)

    c1 = m.get_point_colors(1, pts)
    c2 = m.get_point_colors(1, pts)
    np.testing.assert_array_equal(c1, c2)  # deterministic
    assert c1.dtype == np.uint8 and c1.shape == (len(pts), 3)
    # all three albedo components present: both checker phases + the
    # accent label patch
    assert len(np.unique(c1.reshape(-1, 3), axis=0)) == 3

    # rotate the cylinder 120 degrees about its axis: the shape is
    # invariant, the texture must NOT be (axial spin becomes decidable)
    a = np.deg2rad(120.0)
    R = np.array(
        [
            [np.cos(a), -np.sin(a), 0],
            [np.sin(a), np.cos(a), 0],
            [0, 0, 1],
        ]
    )
    c_rot = m.get_point_colors(1, pts @ R.T)
    frac_changed = (c_rot != c1).any(axis=1).mean()
    assert frac_changed > 0.3

    # untextured bank keeps the legacy single-color path
    m0 = datasets.ProceduralModels()
    assert not m0.textured


def test_render_scene_textured():
    m = datasets.ProceduralModels(textured=True)
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    T = np.eye(4)
    T[2, 3] = 0.6
    out = datasets.extra_render_scene(m, [1], [T], K, (240, 320)) \
        if hasattr(datasets, "extra_render_scene") else None
    if out is None:
        from morefusion_tpu.extra.render import render_scene

        out = render_scene(m, [1], [T], K, (240, 320),
                           n_points_per_object=4000)
    fg = out["instance_label"] >= 0
    assert fg.any()
    # textured object: many distinct foreground colors (flat-color
    # shading alone yields a near-1D color set)
    cols = np.unique(out["rgb"][fg].reshape(-1, 3), axis=0)
    assert len(cols) > 50
