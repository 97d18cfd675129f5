#!/usr/bin/env python
"""Train the instance-segmentation UNet on synthetic frames.

Equivalent role to the reference's Mask R-CNN training
(``examples/ycb_video/instance_segm/train_multi.py``) with the TPU-native
segmentation model (see ``morefusion_tpu/models/segmentation.py``).
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-frames", type=int, default=200)
    parser.add_argument("--image-shape", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--widths", type=int, nargs="+", default=(32, 64, 128, 256))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import numpy as np
    import optax

    from morefusion_tpu import parallel, training
    from morefusion_tpu.datasets.instance_segmentation import (
        SyntheticInstanceSegmentationDataset,
    )
    from morefusion_tpu.models.segmentation import (
        UNetSegmentation,
        segmentation_loss,
    )
    from morefusion_tpu.training.trainer import TrainState

    ds = SyntheticInstanceSegmentationDataset(
        n_frames=args.n_frames, image_shape=tuple(args.image_shape)
    )
    loader = training.BatchLoader(ds, args.batch_size, shuffle=True)

    model = UNetSegmentation(n_class=22, widths=tuple(args.widths))
    example = next(iter(loader))
    params = model.init(jax.random.PRNGKey(args.seed), example["rgb"])
    tx = optax.adam(args.lr)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = parallel.data_mesh()
    from jax.sharding import PartitionSpec as P

    def train_step(state, batch):
        def loss_fn(p):
            logits = model.apply(p, batch["rgb"])
            return segmentation_loss(logits, batch["class_label"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        return state.apply_gradients(grads=grads), loss

    step = jax.jit(
        jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        ),
        donate_argnums=0,
    )

    state = parallel.replicate(state, mesh)
    log = training.LogReport(args.out)
    training.write_args(args.out, vars(args))
    ckpt = training.CheckpointManager(args.out)

    k = 0
    while k < args.steps:
        for batch in loader:
            sb = parallel.shard_batch(batch, mesh)
            state, loss = step(state, sb)
            k += 1
            if k % 50 == 0:
                log.report(
                    {"main/loss": float(jax.device_get(loss))}, step=k
                )
                print(f"step {k}: loss={float(jax.device_get(loss)):.4f}")
            if k >= args.steps:
                break
    ckpt.save_latest(state, k)
    print("done; checkpoint saved to", args.out)


if __name__ == "__main__":
    main()
