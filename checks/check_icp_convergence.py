#!/usr/bin/env python
"""Headless check: ICP convergence traces (fixed vs gated) -> PNG + table.

Visual twin of ``checks``-tier ICP demos: perturb a pose, run
``register_iterative``, plot ADD error vs iteration (numpy rasterized),
and report where the convergence-gated variant stops.
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import numpy as np


def main():
    import scipy.spatial.transform

    from morefusion_tpu.contrib import ICPRegistration
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.extra import viz

    rng = np.random.RandomState(0)
    models = ProceduralModels()
    cad = models.get_pcd(2).astype(np.float32)
    T_true = np.eye(4)
    T_true[:3, 3] = [0, 0, 0.5]
    depth = cad @ T_true[:3, :3].T + T_true[:3, 3]

    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    P = np.eye(4)
    P[:3, :3] = scipy.spatial.transform.Rotation.from_rotvec(
        np.radians(8) * axis
    ).as_matrix()
    P[:3, 3] = rng.uniform(-0.01, 0.01, 3)
    T_init = T_true @ P

    reg = ICPRegistration(depth, cad, T_init)
    errs = []
    for T in reg.register_iterative(iteration=60, voxel_size=0.005):
        errs.append(
            np.linalg.norm(
                (cad @ T[:3, :3].T + T[:3, 3]) - depth, axis=1
            ).mean()
        )
    reg2 = ICPRegistration(depth, cad, T_init)
    reg2.register(iteration=100, voxel_size=0.005)
    n_gated = int(reg2.last_n_iterations)
    print(
        f"ADD: init {errs[0]*1000:.2f} mm -> final {errs[-1]*1000:.3f} mm; "
        f"gated variant stopped at {n_gated} iterations"
    )

    # rasterize the error curve
    H, W = 240, 480
    img = np.full((H, W, 3), 255, np.uint8)
    e = np.asarray(errs)
    y = ((1 - e / e.max()) * (H - 20) + 10).astype(int)
    x = (np.arange(len(e)) / max(len(e) - 1, 1) * (W - 20) + 10).astype(int)
    for k in range(len(e)):
        img[np.clip(y[k], 0, H - 1), np.clip(x[k], 0, W - 1)] = (200, 40, 40)
    gx = int(n_gated / max(len(e) - 1, 1) * (W - 20) + 10)
    img[:, np.clip(gx, 0, W - 1)] = (60, 60, 200)

    out = "/tmp/mftpu_checks/icp_convergence.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    viz.save_image(out, img)
    print("wrote", out)


if __name__ == "__main__":
    main()
