"""Tests for extra utilities: viz, meshio, background compositing."""

import numpy as np
import pytest

from morefusion_tpu.extra import meshio, viz


def _cube_obj(tmp_path):
    verts = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]
    faces = [
        (1, 2, 4), (1, 4, 3), (5, 7, 8), (5, 8, 6), (1, 5, 6), (1, 6, 2),
        (3, 4, 8), (3, 8, 7), (1, 3, 7), (1, 7, 5), (2, 6, 8), (2, 8, 4),
    ]
    p = tmp_path / "cube.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"f {fc[0]} {fc[1]} {fc[2]}\n")
    return str(p)


def test_meshio_obj_roundtrip(tmp_path):
    path = _cube_obj(tmp_path)
    v, f = meshio.load_obj(path)
    assert v.shape == (8, 3) and f.shape == (12, 3)

    s = meshio.sample_surface(v, f, 500)
    assert ((s >= -1e-9) & (s <= 1 + 1e-9)).all()

    occ, pitch, origin = meshio.solid_voxelize(v, f, dim=12)
    # cube fills ~(1/1.02)^3 of the padded grid
    assert occ.mean() == pytest.approx((1 / 1.02) ** 3, abs=0.1)
    inside = meshio.inside_distance_from_occupancy(occ, pitch)
    assert (inside > 0).all()


def test_viz_overlays_and_tiling(rng):
    rgb = rng.randint(0, 255, (40, 60, 3)).astype(np.uint8)
    label = np.full((40, 60), -1, np.int32)
    label[10:30, 20:40] = 0
    out = viz.draw_instance_segmentation(rgb, label)
    assert out.shape == rgb.shape
    assert not (out[15, 30] == rgb[15, 30]).all()  # blended
    assert (out[0, 0] == rgb[0, 0]).all()  # background untouched

    tiled = viz.tile_images([rgb, rgb, rgb])
    assert tiled.shape == (40, 180, 3)


def test_voxel_grid_to_mesh_and_save(tmp_path):
    grid = np.zeros((4, 4, 4))
    grid[1:3, 1:3, 1:3] = 1.0  # 2x2x2 occupied block
    verts, faces = viz.voxel_grid_to_mesh(grid, 0.1, (0, 0, 0))
    # 2x2x2 block has 24 exposed unit faces = 48 triangles
    assert len(faces) == 48
    path = tmp_path / "grid.obj"
    viz.save_obj(str(path), verts, faces)
    v2, f2 = meshio.load_obj(str(path))
    assert len(v2) == len(verts) and len(f2) == len(faces)


def test_background_composite(rng):
    from morefusion_tpu.datasets import BackgroundComposite

    rgb = np.zeros((32, 48, 3), np.uint8)
    label = np.full((32, 48), -1, np.int32)
    label[8:24, 12:36] = 0
    comp = BackgroundComposite(seed=0)
    out = comp(rgb, label)
    assert (out[label >= 0] == 0).all()  # object pixels untouched
    assert out[label < 0].mean() > 1  # background replaced


def test_draw_pose_overlay(rng):
    from morefusion_tpu.datasets import ProceduralModels

    models = ProceduralModels()
    rgb = np.zeros((120, 160, 3), np.uint8)
    K = np.array([[150.0, 0, 80], [0, 150, 60], [0, 0, 1]])
    T = np.eye(4)
    T[:3, 3] = [0, 0, 0.5]
    out = viz.draw_pose_overlay(
        rgb, models, [2], [T], K, n_points_per_object=4000
    )
    assert out.sum() > 0  # object rendered into the frame


def test_depth_to_rgb(rng):
    depth = rng.uniform(0.4, 1.2, (30, 40)).astype(np.float32)
    depth[0, 0] = np.nan
    img = viz.depth_to_rgb(depth)
    assert img.shape == (30, 40, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()  # NaN -> black
    assert img[1:].max() > 0


def test_frame_directory_roundtrip(tmp_path):
    import numpy as np

    from morefusion_tpu.datasets import (
        FrameDirectoryDataset,
        ProceduralModels,
        save_frame,
    )
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=2, random_state=np.random.RandomState(2)
    )
    gen.generate()
    T = gen.random_camera_trajectory(4, 2)[0]
    frame = gen.render_frame(T, shape=(120, 160), n_points_per_object=4000)
    save_frame(str(tmp_path / "000.npz"), frame)

    ds = FrameDirectoryDataset(str(tmp_path), models)
    assert len(ds) == 1
    examples = ds.get_example(0)
    assert len(examples) >= 1
    assert examples[0]["rgb"].shape == (256, 256, 3)
