"""Benchmark: single-view volumetric pose-prediction FPS on one TPU chip.

Headline metric vs. the driver-set target (BASELINE.json north star):
>= 30 FPS single-view prediction with the full flagship model
(SingleView3D + occupancy branch, 256x256 instance crop, 1000 points,
32^3 grid). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/30}

Run with no args on the TPU host. ``--quick`` shrinks iterations for
smoke-testing on CPU.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    if args.quick:
        args.iters, args.warmup = 3, 1

    import jax

    from morefusion_tpu.models import SingleView3D

    B, H, W = args.batch_size, 256, 256
    model = SingleView3D(n_fg_class=21, with_occupancy=True)

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)
    pcd = rng.uniform(0.3, 0.8, (B, H, W, 3)).astype(np.float32)
    pcd[:, : H // 5] = np.nan
    class_id = rng.randint(1, 22, (B,)).astype(np.int32)
    pitch = np.full((B,), 0.0075, np.float32)
    grid = rng.uniform(0, 1, (B, 32, 32, 32)).astype(np.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        class_id=class_id, rgb=rgb, pcd=pcd, pitch=pitch,
        grid_nontarget_empty=grid,
    )

    @jax.jit
    def predict(params, class_id, rgb, pcd, pitch, grid):
        return model.apply(
            params, class_id=class_id, rgb=rgb, pcd=pcd, pitch=pitch,
            grid_nontarget_empty=grid,
        )

    # device-resident inputs so we measure compute, not H2D
    inputs = jax.device_put((params, class_id, rgb, pcd, pitch, grid))

    # NOTE: jax.block_until_ready does not reliably block through the
    # remote TPU relay in this environment; a device->host readback does.
    for _ in range(args.warmup):
        out = predict(*inputs)
    _ = jax.device_get(out[2])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = predict(*inputs)
    _ = jax.device_get(out[2])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    fps = args.iters * B / dt
    baseline = 30.0  # driver target: >=30 FPS single-view prediction
    print(
        json.dumps(
            {
                "metric": "pose_inference_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
