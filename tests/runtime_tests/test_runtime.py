"""Tests for the runtime pipeline nodes (tracking, fusion, voting, picking,
and the full end-to-end scene pipeline on synthetic frames)."""

import jax
import numpy as np
import pytest

from morefusion_tpu import runtime
from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.simulation import PlaneTypeSceneGeneration


def test_track_instance_id_matches_by_iou():
    H, W = 120, 160
    reference = np.full((H, W), -1, np.int32)
    reference[30:90, 40:100] = 5  # mapped instance 5

    target = np.full((H, W), -1, np.int32)
    target[32:92, 42:102] = 0  # detection 0 overlaps instance 5

    out, classes, counter = runtime.track_instance_id(
        reference, target, {0: 7}, instance_counter=10
    )
    assert (out[40:80, 50:90] == 5).all()  # relabeled to the map id
    assert classes == {5: 7}
    assert counter == 10  # no new instance


def test_track_instance_id_new_instance():
    H, W = 480, 640
    reference = np.full((H, W), -1, np.int32)
    target = np.full((H, W), -1, np.int32)
    target[140:340, 200:440] = 0  # big, central detection

    out, classes, counter = runtime.track_instance_id(
        reference, target, {0: 3}, instance_counter=0
    )
    assert counter == 1
    assert classes == {0: 3}
    assert (out[200:300, 260:380] == 0).all()


def test_track_instance_id_suppresses_edge_mask():
    H, W = 480, 640
    reference = np.full((H, W), -1, np.int32)
    target = np.full((H, W), -1, np.int32)
    target[0:100, 0:100] = 0  # corner detection (mostly in the edge band)

    out, classes, counter = runtime.track_instance_id(
        reference, target, {0: 3}, instance_counter=0
    )
    assert counter == 0
    assert classes == {}
    assert (out[:60, :60] == -2).all()


def test_object_track_voting():
    models = ProceduralModels()
    track = runtime.ObjectTrack(
        2, models.get_pcd(2), is_symmetric=False, n_votes=3
    )
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.2, 0.5]
    for _ in range(2):
        track.append_pose(T)
        assert not track.validate()
    track.append_pose(T)
    assert track.validate()
    assert track.is_spawned
    np.testing.assert_allclose(track.pose, T)

    # inconsistent poses never spawn
    track2 = runtime.ObjectTrack(
        2, models.get_pcd(2), is_symmetric=False, n_votes=3
    )
    for k in range(6):
        Tk = np.eye(4)
        Tk[:3, 3] = [0.1 * k, 0, 0.5]
        track2.append_pose(Tk)
        track2.validate()
    assert not track2.is_spawned


def test_picking_order():
    # 2 occludes 1, 1 occludes 0 -> order to reach 0: [2, 1, 0]
    occluded_by = {0: {1}, 1: {2}, 2: set()}
    order = runtime.select_picking_order(occluded_by, target=0)
    assert order == [2, 1, 0]

    # unrelated object not included
    occluded_by = {0: set(), 1: set()}
    assert runtime.select_picking_order(occluded_by, target=0) == [0]


def test_occlusion_graph_from_renders():
    models = ProceduralModels()
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    # two boxes stacked along the view axis: 0 in front of 1
    T0 = np.eye(4); T0[:3, 3] = [0, 0, 0.5]
    T1 = np.eye(4); T1[:3, 3] = [0, 0, 0.8]
    g = runtime.build_occlusion_graph(
        models, [21, 16], [T0, T1], K, (240, 320),
        n_points_per_object=6000,
    )
    assert 0 in g[1]  # object 1 is occluded by object 0
    assert not g[0]  # front object unoccluded
    assert runtime.select_picking_order(g, target=1) == [0, 1]


def test_suction_grasp_pose():
    pts = np.array([[0, 0, 0.5], [0, 0, 0.4]])
    normals = np.array([[0, 0, 1.0], [0, 0, -1.0]])
    T = runtime.suction_grasp_pose(pts, normals, up=(0, 0, -1))
    np.testing.assert_allclose(T[:3, 3], [0, 0, 0.4])
    np.testing.assert_allclose(T[:3, 2], [0, 0, 1.0], atol=1e-9)  # approach


def test_scene_pipeline_end_to_end():
    """Full serve path on a synthetic scene with GT segmentation."""
    from morefusion_tpu.models import tiny_singleview3d

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=2, random_state=np.random.RandomState(1)
    )
    gen.generate()
    assert len(gen.objects) == 2
    T_cam = gen.random_camera_trajectory(4, 3)[0]
    frame = gen.render_frame(T_cam, shape=(120, 160), n_points_per_object=6000)

    model = tiny_singleview3d(21, n_point=32, with_occupancy=True)
    rng = np.random.RandomState(0)
    init_kwargs = dict(
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **init_kwargs)

    pipe = runtime.ScenePipeline(
        model, params, models, native_mapping=True, size_filter=False
    )
    inst_to_class = {
        int(i): int(frame["class_ids"][k])
        for k, i in enumerate(frame["instance_ids"])
    }
    results = pipe.process_frame(
        frame["rgb"].astype(np.float32),
        frame["depth"],
        frame["intrinsic_matrix"],
        frame["T_cam2world"],
        instance_label=frame["instance_label"],
        instance_to_class=inst_to_class,
        refine=False,  # ICC compile is exercised in contrib tests
    )
    assert len(results) >= 1
    for res in results.values():
        assert res["T_cad2cam"].shape == (4, 4)
        assert np.isfinite(res["T_cad2cam"]).all()
        assert "T_cad2world" in res
