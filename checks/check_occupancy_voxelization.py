#!/usr/bin/env python
"""Headless check: pseudo-occupancy grids of a CAD model -> OBJ + PNG.

Equivalent of the reference's interactive
``checks/functions_checks/geometry_checks/check_occupancy_voxelization.py``
(display_scenes window), writing artifacts instead.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np


def main():
    import jax.numpy as jnp

    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz
    from morefusion_tpu.functions import pseudo_occupancy_voxelization

    models = ProceduralModels()
    class_id = 2
    vox = models.get_solid_voxel_grid(class_id)
    pitch = models.get_voxel_pitch(32, class_id)
    origin = -pitch * 15.5 * np.ones(3)

    u, s, i = pseudo_occupancy_voxelization(
        jnp.asarray(vox.points, jnp.float32),
        jnp.asarray(vox.inside_distance, jnp.float32),
        pitch=pitch, origin=origin, dims=(32, 32, 32), threshold=2.0,
    )
    out_dir = "/tmp/mftpu_checks"
    os.makedirs(out_dir, exist_ok=True)
    for name, g in [("uniform", u), ("surface", s), ("inside", i)]:
        g = np.asarray(g)
        verts, faces = viz.voxel_grid_to_mesh(g, pitch, origin, threshold=0.5)
        path = f"{out_dir}/occupancy_{name}.obj"
        viz.save_obj(path, verts, faces)
        print(f"{name}: occ>{0.5} voxels={int((g > 0.5).sum())} -> {path}")


if __name__ == "__main__":
    main()
