#!/usr/bin/env python
"""Ablate the train-step backward to locate the real bottleneck.

VERDICT round-3 item 7: the 186.5 ms fp32 step was attributed to the
``interpolate_voxel_grid`` VJP scatter-adds and the ADD-S KNN backward
without a direct measurement. This script measures, in ONE process on
the real device (relative timings are contention-robust):

  A. full fp32 train step                    (baseline)
  B. step with interpolate grid-VJP zeroed   (upper bound of any
     scatter-kernel win: the backward scatter is simply gone)
  C. step with ADD-S loss forced asymmetric  (KNN fwd+bwd gone)
  D. step with BOTH ablations
  E. full bf16-compute step                  (the mixed-precision lever:
     fp32 MXU throughput is ~1/4 of bf16 on v5e)

If A-B and A-C are small, the scatter VJP is *not* the bottleneck and
the committed conclusion is that the fp32 step is conv-gradient
compute-bound (fp32 peak), with bf16 compute as the real lever.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--steps", type=int, default=15)
    parser.add_argument(
        "--align-only", action="store_true",
        help="run only A/G/H (the round-5 MXU-alignment probe) — the "
        "round-4 ablations B-F are committed in docs/BENCH_NOTES.md",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from examples.profile_train import make_batch
    from morefusion_tpu import models
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.functions import voxelization as vox
    from morefusion_tpu.training import trainer as trainer_module

    B = args.batch_size
    batch = make_batch(B)
    bank = trainer_module.CadPointBank.build(
        ProceduralModels(), 21, with_solid=True
    )
    jb = {k: np.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    interp_orig = vox.interpolate_voxel_grid

    def interp_no_grid_grad(grid, points, batch_indices):
        # gradient flows to points but NOT to the grid -> the backward
        # scatter-add disappears from the program
        return interp_orig(
            jax.lax.stop_gradient(grid), points, batch_indices
        )

    def run_variant(name, dtype, interp=None, symmetric=True, **mkw):
        import morefusion_tpu.models.singleview_3d as sv3d

        if interp is not None:
            sv3d.F.interpolate_voxel_grid = interp
        try:
            model = models.SingleView3D(
                n_fg_class=21, with_occupancy=True, compute_dtype=dtype,
                **mkw,
            )
            state = trainer_module.create_train_state(
                model, batch, rng, with_occupancy=True
            )
            step = jax.jit(
                trainer_module.make_train_step(
                    model, bank, with_occupancy=True,
                    occupancy_loss_term=True,
                )
            )
            sym = np.bool_(bool(symmetric))
            flops = None
            try:
                ca = step.lower(state, jb, sym, rng).compile()
                ca = ca.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0] if ca else {}
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass
            t0 = time.time()
            state, m = step(state, jb, sym, rng)
            jax.device_get(m["loss"])
            compile_s = time.time() - t0
            for _ in range(3):
                state, m = step(state, jb, sym, rng)
            jax.device_get(m["loss"])
            t0 = time.time()
            for _ in range(args.steps):
                state, m = step(state, jb, sym, rng)
            jax.device_get(m["loss"])
            dt = (time.time() - t0) / args.steps
            tf = f" {flops / dt / 1e12:5.1f} TF/s" if flops else ""
            print(
                f"{name:44s} {dt * 1e3:7.1f} ms/step{tf} "
                f"(compile {compile_s:.0f}s)",
                flush=True,
            )
            return dt
        finally:
            sv3d.F.interpolate_voxel_grid = interp_orig

    f32 = jnp.float32
    a = run_variant("A full fp32", f32)
    if args.align_only:
        b = c = d = e = f = a
    else:
        b = run_variant("B fp32, interp grid-VJP zeroed", f32,
                        interp=interp_no_grid_grad)
        c = run_variant("C fp32, asymmetric loss (no KNN)", f32,
                        symmetric=False)
        d = run_variant("D fp32, both ablations", f32,
                        interp=interp_no_grid_grad, symmetric=False)
        e = run_variant("E full bf16 compute", jnp.bfloat16)
        f = run_variant("F fp32, sorted-segment interp VJP", f32,
                        interp=vox.interpolate_voxel_grid_sorted)
    # VERDICT r4 item 7: MXU-lane alignment of the 3-D tower input —
    # (64, 8, 96, 16) makes conv3 consume 96+16+16 = 128 channels
    # instead of 160 (fresh init; cannot warm-start — the probe compares
    # achieved TFLOP/s, since the variant also removes real FLOPs).
    g = run_variant("G fp32, conv3-in 128ch (MXU-aligned)", f32,
                    point_widths=(64, 8, 96, 16))
    h = run_variant("H bf16, conv3-in 128ch (MXU-aligned)",
                    jnp.bfloat16, point_widths=(64, 8, 96, 16))

    print("\n=== attribution (ms) ===")
    if not args.align_only:
        print(f"interp grid-VJP scatter : {1e3 * (a - b):7.1f}")
        print(f"ADD-S KNN fwd+bwd       : {1e3 * (a - c):7.1f}")
        print(f"both                    : {1e3 * (a - d):7.1f}")
        print(f"bf16-compute saving     : {1e3 * (a - e):7.1f}")
        print(f"sorted-VJP saving       : {1e3 * (a - f):7.1f} "
              f"(item-7 kernel attempt; upper bound is A-B)")
    print(f"128ch-aligned fp32 delta: {1e3 * (a - g):7.1f}")
    print(f"128ch-aligned bf16 delta: {1e3 * (a - h):7.1f}")


if __name__ == "__main__":
    main()
