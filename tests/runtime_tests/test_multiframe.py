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
