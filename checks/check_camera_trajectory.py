#!/usr/bin/env python
"""Headless check: camera-trajectory synthesis -> PNG path plot + views.

Equivalent of the reference's trajectory checks
(``checks/geometry_checks/check_trajectory*.py``): sphere-sampled
viewpoints, KD-sorted into a smooth path, pose-interpolated, then rendered
as (a) a top-down path plot and (b) first/mid/last rendered frames.
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import numpy as np


def main():
    from morefusion_tpu import geometry
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=4, random_state=np.random.RandomState(3)
    )
    gen.generate()
    traj = gen.random_camera_trajectory(n_keypoints=6, n_points=5)
    eyes = np.stack([T[:3, 3] for T in traj])
    print(f"trajectory: {len(traj)} poses, eye z range "
          f"[{eyes[:, 2].min():.2f}, {eyes[:, 2].max():.2f}]")

    # top-down path plot (plain numpy rasterization, no matplotlib)
    H = W = 400
    plot = np.full((H, W, 3), 255, np.uint8)
    xy = eyes[:, :2]
    lo, hi = xy.min(0) - 0.05, xy.max(0) + 0.05
    px = ((xy - lo) / (hi - lo) * (W - 20) + 10).astype(int)
    for k in range(len(px) - 1):
        n = 20
        for t in range(n + 1):
            x, y = (px[k] * (n - t) + px[k + 1] * t) // n
            plot[np.clip(H - 1 - y, 0, H - 1), np.clip(x, 0, W - 1)] = (
                (200, 60, 60) if t == 0 else (60, 60, 200)
            )
    # objects as dots
    for obj in gen.objects.values():
        p = obj["T_cad2world"][:2, 3]
        x, y = ((p - lo) / (hi - lo) * (W - 20) + 10).astype(int)
        yy, xx = np.clip(H - 1 - y, 2, H - 3), np.clip(x, 2, W - 3)
        plot[yy - 2 : yy + 3, xx - 2 : xx + 3] = (40, 160, 40)

    views = []
    for idx in (0, len(traj) // 2, len(traj) - 1):
        frame = gen.render_frame(traj[idx], shape=(200, 200))
        views.append(frame["rgb"])

    # interpolation sanity: consecutive eyes move smoothly
    step = np.linalg.norm(np.diff(eyes, axis=0), axis=1)
    print(f"step lengths: mean {step.mean():.3f} max {step.max():.3f}")

    out_dir = "/tmp/mftpu_checks"
    os.makedirs(out_dir, exist_ok=True)
    viz.save_image(os.path.join(out_dir, "trajectory_path.png"), plot)
    viz.save_image(
        os.path.join(out_dir, "trajectory_views.png"),
        viz.tile_images(views, cols=3),
    )
    # smoke the low-level helpers too (grid sampling with pole dedup)
    pts = geometry.uniform_points_on_sphere(8, radius=0.6)
    assert pts.ndim == 2 and pts.shape[1] == 3
    assert np.allclose(np.linalg.norm(pts, axis=1), 0.6, atol=1e-6)
    print("wrote", os.path.join(out_dir, "trajectory_path.png"))


if __name__ == "__main__":
    main()
