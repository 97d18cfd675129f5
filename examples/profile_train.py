#!/usr/bin/env python
"""Profile the flagship train step: per-stage timing + bf16 comparison.

VERDICT round-2 item 6: the 228 ms/step device ceiling was unprofiled.
This script measures, on the real device, steady-state timings for

  - the full dp train step (fp32 and bf16 activation compute),
  - forward-only loss (fwd/bwd split),
  - the 2D backbone (ResNet+PSP), the voxel branch (voxelization +
    3D convs + interpolation), the pose towers, and the ADD loss,

and prints a table plus an MFU estimate. Synthetic batch, real shapes
(B=16, 256^2, 1000 points, 32^3 grids) — no dataset needed.

Usage: python examples/profile_train.py [--batch-size 16] [--steps 20]
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import time


def make_batch(B, H=256, W=256, V=32, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)
    pcd = rng.uniform(-0.2, 0.2, (B, H, W, 3)).astype(np.float32)
    pcd[..., 2] += 0.8
    hole = rng.rand(B, H, W) < 0.35
    pcd[hole] = np.nan
    q = rng.randn(B, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return dict(
        class_id=rng.randint(1, 22, B).astype(np.int32),
        rgb=rgb,
        pcd=pcd,
        quaternion_true=q,
        translation_true=np.float32(
            rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.8]
        ),
        origin=np.float32(rng.uniform(-0.2, 0.0, (B, 3)) + [0, 0, 0.7]),
        pitch=np.full(B, 0.01, np.float32),
        grid_target=(rng.rand(B, V, V, V) < 0.05).astype(np.float32),
        grid_nontarget_empty=(rng.rand(B, V, V, V) < 0.3).astype(
            np.float32
        ),
    )


def timeit(fn, *args, steps=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(
        lambda x: jax.device_get(x) if hasattr(x, "shape") else x, out
    )
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    # force full sync through the relay (block_until_ready doesn't block
    # through it): fetch one leaf
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    jax.device_get(leaves[0])
    return (time.time() - t0) / steps


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--trace-dir", default=None,
                        help="optional jax.profiler trace output dir")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from morefusion_tpu import models
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.training import trainer as trainer_module
    from morefusion_tpu import parallel

    print("device:", jax.devices()[0])
    B = args.batch_size
    batch = make_batch(B)
    bank = trainer_module.CadPointBank.build(
        ProceduralModels(), 21, with_solid=False
    )
    mesh = parallel.data_mesh()
    results = {}

    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = models.SingleView3D(
            n_fg_class=21, with_occupancy=True, compute_dtype=dtype
        )
        rng = jax.random.PRNGKey(0)
        state = trainer_module.create_train_state(
            model, batch, rng, with_occupancy=True
        )
        state = parallel.replicate(state, mesh)
        step = trainer_module.make_dp_train_step(
            model, bank, mesh, with_occupancy=True,
            occupancy_loss_term=False,
        )
        sb = parallel.shard_batch(batch, mesh)
        sym = np.bool_(True)

        t0 = time.time()
        state, metrics = step(state, sb, sym, rng)  # donates the old state
        jax.device_get(metrics["loss"])
        print(
            f"[{name}] first call (compile): {time.time() - t0:.1f}s",
            flush=True,
        )

        def run(state):
            # donation: keep a fresh state per call chain
            s, m = step(state, sb, sym, rng)
            return s, m

        # measure without donation hazards: loop carrying state
        for _ in range(3):
            state, m = run(state)
        jax.device_get(m["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            state, m = run(state)
        jax.device_get(m["loss"])
        dt = (time.time() - t0) / args.steps
        results[f"train_step_{name}"] = dt
        print(f"[{name}] train step: {dt * 1e3:.1f} ms "
              f"({B / dt:.1f} samples/s)", flush=True)

        # forward-only loss
        params = state.params

        @jax.jit
        def fwd(params, batch):
            quat, trans, conf = model.apply(
                params,
                class_id=batch["class_id"], rgb=batch["rgb"],
                pcd=batch["pcd"], pitch=batch["pitch"],
                origin=batch["origin"],
                grid_nontarget_empty=batch["grid_nontarget_empty"],
                rng=jax.random.PRNGKey(0), train=False,
            )
            return quat.sum() + trans.sum() + conf.sum()

        results[f"fwd_{name}"] = timeit(
            fwd, params, sb, steps=args.steps
        )
        print(f"[{name}] forward only: "
              f"{results[f'fwd_{name}'] * 1e3:.1f} ms")

    # ---- stage breakdown (fp32 model) ----
    model = models.SingleView3D(n_fg_class=21, with_occupancy=True)
    rng = jax.random.PRNGKey(0)
    state = trainer_module.create_train_state(
        model, batch, rng, with_occupancy=True
    )
    params = state.params
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    # 2D backbone
    @jax.jit
    def backbone(params, rgb):
        def run(mdl):
            h = mdl.resnet_extractor(rgb)
            return mdl.pspnet_extractor(h, train=False)

        return model.apply(params, method=run)

    h_rgb = backbone(params, jb["rgb"])
    results["backbone_fwd"] = timeit(
        backbone, params, jb["rgb"], steps=args.steps
    )

    @jax.jit
    def backbone_grad(params, rgb):
        return jax.grad(
            lambda p: backbone(p, rgb).sum()
        )(params)

    results["backbone_fwdbwd"] = timeit(
        backbone_grad, params, jb["rgb"], steps=max(args.steps // 2, 5)
    )

    # voxel branch: sampled values/points -> fused features
    import numpy as np

    P = 1000
    vals = jnp.asarray(np.random.RandomState(0).randn(B, P, 32), jnp.float32)
    pts = jnp.asarray(
        np.random.RandomState(1).uniform(0, 32, (B, P, 3)), jnp.float32
    )

    @jax.jit
    def voxel_branch(params, vals, pts, gne):
        def run(mdl):
            return mdl._extract(vals, pts, gne, False)

        return model.apply(params, method=run)

    results["voxel_branch_fwd"] = timeit(
        voxel_branch, params, vals, pts, jb["grid_nontarget_empty"],
        steps=args.steps,
    )

    @jax.jit
    def voxel_branch_grad(params, vals, pts, gne):
        return jax.grad(
            lambda p: voxel_branch(p, vals, pts, gne).sum()
        )(params)

    results["voxel_branch_fwdbwd"] = timeit(
        voxel_branch_grad, params, vals, pts,
        jb["grid_nontarget_empty"], steps=max(args.steps // 2, 5),
    )

    # towers
    feat = voxel_branch(params, vals, pts, jb["grid_nontarget_empty"])

    @jax.jit
    def towers(params, feat, cid):
        def run(mdl):
            r, t, c = mdl.heads(feat)
            from morefusion_tpu.models.heads import select_class

            return select_class(r, t, c, cid - 1)

        return model.apply(params, method=run)

    results["towers_fwd"] = timeit(
        towers, params, feat, jb["class_id"], steps=args.steps
    )

    # ADD loss
    from morefusion_tpu.models import losses as losses_module

    quat, trans, conf = towers(params, feat, jb["class_id"])

    @jax.jit
    def loss_only(quat, trans, conf, batch):
        cad = bank.points[batch["class_id"]]
        sym = bank.symmetric[batch["class_id"]]
        return losses_module.pose_loss(
            quaternion_pred=quat, translation_pred=trans,
            confidence_pred=conf,
            quaternion_true=batch["quaternion_true"],
            translation_true=batch["translation_true"],
            cad_points=cad, symmetric=sym,
        )

    results["add_loss_fwd"] = timeit(
        loss_only, quat, trans, conf, jb, steps=args.steps
    )

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                backbone(params, jb["rgb"])
            jax.device_get(backbone(params, jb["rgb"]))
        print("trace written to", args.trace_dir)

    print("\n=== profile summary (ms) ===")
    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.1f}")

    # rough FLOP-based MFU estimate for the fp32 step (cost analysis of
    # the single-device step program)
    try:
        single = trainer_module.make_train_step(
            model, bank, with_occupancy=True, occupancy_loss_term=False
        )
        batch_js = dict(jb)
        lowered = jax.jit(single).lower(
            state, batch_js, np.bool_(True), rng
        )
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops") if cost else None
        if flops:
            dt = results.get("train_step_fp32")
            print(f"\nstep flops (XLA cost analysis): {flops / 1e9:.1f} G")
            if dt:
                print(f"achieved: {flops / dt / 1e12:.2f} TFLOP/s")
    except Exception as e:
        print("cost analysis unavailable:", e)


if __name__ == "__main__":
    main()
