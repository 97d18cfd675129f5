#!/usr/bin/env python
"""Headless check: cluttered-scene generation from 3 viewpoints -> PNG.

Equivalent of ``checks/simulation_checks/.../check_random_trajectory.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np


def main():
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models, n_object=5, random_state=np.random.RandomState(7)
    )
    gen.generate()
    print(f"placed {len(gen.objects)} objects")
    traj = gen.random_camera_trajectory(6, 3)
    views = []
    for T in traj:
        frame = gen.render_frame(T, shape=(240, 320))
        views.append(
            viz.draw_instance_segmentation(
                frame["rgb"], frame["instance_label"], alpha=0.3
            )
        )
    out = "/tmp/mftpu_checks/scene_views.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(out, viz.tile_images(views))
    print("wrote", out)


if __name__ == "__main__":
    main()
