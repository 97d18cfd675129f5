"""Multi-frame fusion + tracking integration: instance ids persist across
viewpoints via the raycast-render + IoU matching loop."""

import numpy as np

from morefusion_tpu.datasets import ProceduralModels
from morefusion_tpu.geometry import pointcloud_from_depth
from morefusion_tpu.geometry.transform import transform_points_np
from morefusion_tpu.runtime.fusion import OccupancyFusion
from morefusion_tpu.simulation import PlaneTypeSceneGeneration


def _world_cloud(frame):
    K = frame["intrinsic_matrix"]
    depth = frame["depth"]
    H, W = depth.shape
    pcd = pointcloud_from_depth(
        depth, fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2]
    )
    flat = pcd.reshape(-1, 3)
    ok = ~np.isnan(flat).any(axis=1)
    out = np.full_like(flat, np.nan)
    out[ok] = transform_points_np(flat[ok], frame["T_cam2world"])
    return out.reshape(H, W, 3)


def test_tracking_across_frames():
    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=2, random_state=np.random.RandomState(5)
    )
    gen.generate()
    traj = gen.random_camera_trajectory(5, 3, distance=(0.45, 0.55))

    fusion = OccupancyFusion(models, size_filter=False)
    assigned = []
    for k, T_cam in enumerate(traj[:3]):
        frame = gen.render_frame(T_cam, shape=(120, 160))
        pw = _world_cloud(frame)
        # detections come with FRESH ids each frame (like a detector)
        det = frame["instance_label"].copy()
        det_classes = {
            int(i): int(c)
            for i, c in zip(frame["instance_ids"], frame["class_ids"])
        }
        label = fusion.process_frame(
            pw, det, det_classes,
            K=frame["intrinsic_matrix"],
            T_cam2world=frame["T_cam2world"],
            camera_origin=frame["T_cam2world"][:3, 3],
            track=True,
        )
        ids = sorted(i for i in np.unique(label) if i >= 0)
        assigned.append(ids)

    # ids assigned in frame 0 persist in later frames (tracking works):
    # the map's instance registry should not balloon with fresh ids
    all_ids = set()
    for ids in assigned:
        all_ids.update(ids)
    assert len(all_ids) <= 3  # 2 objects + at most 1 spurious split
    assert len(fusion.instance_to_class) <= 3
    # at least one object tracked across all frames
    persistent = set(assigned[0])
    for ids in assigned[1:]:
        persistent &= set(ids)
    assert len(persistent) >= 1


def test_async_refine_resolves_next_frame():
    """async_refine dispatches ICC without blocking; the result lands on
    the next frame (or flush_refine), mirroring the reference's decoupled
    refinement node."""
    import jax

    from morefusion_tpu import runtime
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.models import tiny_singleview3d
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=2, random_state=np.random.RandomState(3)
    )
    gen.generate()
    traj = gen.random_camera_trajectory(4, 3)
    frames = [
        gen.render_frame(T, shape=(120, 160), n_points_per_object=6000)
        for T in traj[:3]
    ]

    model = tiny_singleview3d(21, n_point=32, with_occupancy=True)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    pipe = runtime.ScenePipeline(
        model, params, models, native_mapping=True, size_filter=False,
        n_votes=1, async_refine=True,
    )
    for frame in frames:
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
            refine=True,
        )
    refined = pipe.flush_refine()
    assert len(refined) >= 1
    for T in refined.values():
        assert T.shape == (4, 4)
        assert np.isfinite(T).all()
    # the stale result was also folded into the frame results
    assert any("T_cad2world_refined" in r for r in results.values())
