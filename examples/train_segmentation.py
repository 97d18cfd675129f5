#!/usr/bin/env python
"""Train the instance-segmentation UNet (class + instance-boundary heads).

Equivalent role to the reference's Mask R-CNN training
(``examples/ycb_video/instance_segm/train_multi.py``), TPU-native: a UNet
predicts per-pixel class logits plus an instance-boundary logit; instances
are recovered on the host as boundary-separated connected components —
multiple instances per class supported (see
``morefusion_tpu/models/segmentation.py``).

Reports held-out mIoU and instance detection rate (IoU >= 0.5 greedy
matching) at the end of training.
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
    parser.add_argument("--n-frames", type=int, default=400)
    parser.add_argument("--n-val-frames", type=int, default=30)
    parser.add_argument("--image-shape", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--n-objects", type=int, nargs=2, default=(4, 10))
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument(
        "--widths", type=int, nargs="+", default=(32, 64, 128, 256)
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--no-boundary", action="store_true",
        help="disable the instance-boundary head (one-component-per-class "
        "fallback instancing)",
    )
    args = parser.parse_args()

    import jax
    import numpy as np
    import optax

    from morefusion_tpu import parallel, training
    from morefusion_tpu.datasets.instance_segmentation import (
        SyntheticInstanceSegmentationDataset,
    )
    from morefusion_tpu.models.segmentation import (
        SegmentationNode,
        UNetSegmentation,
        boundary_loss,
        match_instances,
        miou,
        segmentation_loss,
    )
    from morefusion_tpu.training.trainer import TrainState

    with_boundary = not args.no_boundary
    ds = SyntheticInstanceSegmentationDataset(
        split="train",
        n_frames=args.n_frames,
        image_shape=tuple(args.image_shape),
        n_objects=tuple(args.n_objects),
        format="instance",
        seed=args.seed,
    )
    loader = training.BatchLoader(ds, args.batch_size, shuffle=True)

    model = UNetSegmentation(
        n_class=22, widths=tuple(args.widths), with_boundary=with_boundary
    )
    example = next(iter(loader))
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), example["rgb"])
    tx = optax.adam(args.lr)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = parallel.data_mesh()
    from jax.sharding import PartitionSpec as P

    def train_step(state, batch):
        def loss_fn(p):
            out = model.apply(p, batch["rgb"])
            if with_boundary:
                logits, blog = out
                l_cls = segmentation_loss(logits, batch["class_label"])
                l_bnd = boundary_loss(blog, batch["boundary"])
                return l_cls + l_bnd, (l_cls, l_bnd)
            l_cls = segmentation_loss(out, batch["class_label"])
            return l_cls, (l_cls, 0.0)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
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
            sb = parallel.shard_batch(
                {k2: batch[k2] for k2 in ("rgb", "class_label", "boundary")
                 if k2 in batch},
                mesh,
            )
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

    # held-out evaluation: mIoU + instance detection rate
    val = SyntheticInstanceSegmentationDataset(
        split="val",
        n_frames=args.n_val_frames,
        image_shape=tuple(args.image_shape),
        n_objects=tuple(args.n_objects),
        format="instance",
        seed=args.seed + 1,
    )
    params_host = jax.device_get(state.params)
    node = SegmentationNode(model, params_host)
    mious, matched, n_gt, n_pred = [], 0, 0, 0
    for i in range(len(val)):
        ex = val.get_example(i)
        pred_label, pred_classes = node(ex["rgb"])
        class_map_pred = np.zeros(pred_label.shape, np.int32)
        for pid, cid in pred_classes.items():
            class_map_pred[pred_label == pid] = cid
        mious.append(miou(class_map_pred, ex["class_label"]))
        gt_classes = {}
        for gid in np.unique(ex["instance_label"]):
            if gid < 0:
                continue
            sel = ex["instance_label"] == gid
            gt_classes[int(gid)] = int(ex["class_label"][sel][0])
        m, g, p = match_instances(
            pred_label, pred_classes, ex["instance_label"], gt_classes
        )
        matched += m
        n_gt += g
        n_pred += p

    summary = {
        "validation/miou": float(np.mean(mious)),
        "validation/detection_rate": matched / max(n_gt, 1),
        "validation/precision": matched / max(n_pred, 1),
        "validation/n_gt": n_gt,
    }
    log.report(summary, step=k)
    print("validation:", {k2: round(v, 4) for k2, v in summary.items()})


if __name__ == "__main__":
    main()
