#!/usr/bin/env python
"""Train the instance-segmentation UNet (class + instance-boundary heads).

Equivalent role to the reference's Mask R-CNN training
(``examples/ycb_video/instance_segm/train_multi.py``), TPU-native: a UNet
predicts per-pixel class logits plus an instance-boundary logit; instances
are recovered as boundary-separated connected components — computed on
device (``ops/connected_components.py``), multiple instances per class
supported (see ``morefusion_tpu/models/segmentation.py``).

Round-3 additions (VERDICT item 4): RGB-D input (--use-depth), photometric
augmentation on top of the background compositing, per-class held-out
metrics, and a larger default data/step budget.

Reports held-out mIoU and instance detection rate (IoU >= 0.5 greedy
matching) at the end of training.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-frames", type=int, default=800)
    parser.add_argument("--n-val-frames", type=int, default=50)
    parser.add_argument("--image-shape", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--n-objects", type=int, nargs=2, default=(4, 10))
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--steps", type=int, default=4000)
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
    parser.add_argument(
        "--use-depth", action="store_true",
        help="RGB-D input: depth discontinuities separate cluttered "
        "instances far better than RGB alone (deviation from the "
        "reference's RGB-only Mask R-CNN, justified by the RGB-D "
        "runtime contract — depth is always available in the pipeline)",
    )
    parser.add_argument(
        "--no-augment", action="store_true",
        help="disable photometric augmentation (contrast/HSV/blur/"
        "resolution, the reference reindexed.py:39-67 stack)",
    )
    parser.add_argument(
        "--eval-only", action="store_true",
        help="skip training; restore the latest checkpoint from --out "
        "and run the held-out evaluation (same-weights A/B of "
        "instancing-time choices)",
    )
    parser.add_argument(
        "--no-merge", action="store_true",
        help="disable merge_occlusion_splits at instancing time "
        "(round-5 over-splitting fix ablation)",
    )
    parser.add_argument(
        "--fg-weight", type=float, default=1.0,
        help="foreground pixel weight in the class CE (recall lever "
        "for heavily occluded objects; 1.0 = plain mean)",
    )
    parser.add_argument(
        "--min-area", type=int, default=50,
        help="instancing min component area in px (heavily occluded "
        "objects leave small visible fragments; sweep with --eval-only)",
    )
    args = parser.parse_args()

    # share synthesized frames across processes (a CPU process can
    # pre-generate them while the device is busy; ~1 s/frame otherwise)
    os.environ.setdefault("MFTPU_SEG_CACHE", "/root/data/segcache")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from morefusion_tpu import parallel, training
    from morefusion_tpu.datasets.instance_segmentation import (
        SyntheticInstanceSegmentationDataset,
    )
    from morefusion_tpu.datasets.rgbd_pose_estimation.augmentation import (
        augment_rgb,
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
    aug_rng = np.random.RandomState(args.seed + 99)

    def transform(ex):
        if not args.no_augment:
            ex = dict(
                ex,
                rgb=augment_rgb(
                    np.clip(ex["rgb"], 0, 255).astype(np.uint8), aug_rng
                ).astype(np.float32),
            )
        return ex

    loader = training.BatchLoader(
        ds, args.batch_size, transform, shuffle=True
    )

    model = UNetSegmentation(
        n_class=22,
        widths=tuple(args.widths),
        with_boundary=with_boundary,
        use_depth=args.use_depth,
    )
    example = next(iter(loader))

    def apply_model(p, batch, params_rng=None):
        # batches ship quantized (uint8 rgb / fp16 depth) — the relay
        # client leaks ~payload bytes of host RSS per device_put, so the
        # 4000-step run's H2D volume must stay small (see
        # training/loop.py LeakBudgetExit); cast back on device
        rgb = batch["rgb"].astype(jnp.float32)
        kwargs = {}
        if args.use_depth:
            kwargs["depth"] = batch["depth"].astype(jnp.float32)
        if params_rng is not None:
            return model.init(params_rng, rgb, **kwargs)
        return model.apply(p, rgb, **kwargs)

    params = jax.jit(
        lambda b: apply_model(None, b, jax.random.PRNGKey(args.seed))
    )(example)
    tx = optax.adam(args.lr)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = parallel.data_mesh()
    from jax.sharding import PartitionSpec as P

    def train_step(state, batch):
        def loss_fn(p):
            out = apply_model(p, batch)
            if with_boundary:
                logits, blog = out
                l_cls = segmentation_loss(
                    logits, batch["class_label"].astype(jnp.int32),
                    fg_weight=args.fg_weight,
                )
                l_bnd = boundary_loss(blog, batch["boundary"])
                return l_cls + l_bnd, (l_cls, l_bnd)
            l_cls = segmentation_loss(
                out, batch["class_label"].astype(jnp.int32),
                fg_weight=args.fg_weight,
            )
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
    if not args.eval_only:  # keep the training run's args.json intact
        training.write_args(args.out, vars(args))
    ckpt = training.CheckpointManager(args.out)

    if args.eval_only:
        restored = ckpt.restore_latest(state)
        if restored is None:
            raise SystemExit(f"--eval-only: no checkpoint under {args.out}")
        state = restored
        args.steps = 0

    batch_keys = ("rgb", "class_label", "boundary") + (
        ("depth",) if args.use_depth else ()
    )
    k = 0
    while k < args.steps:
        for batch in loader:
            small = {}
            for k2 in batch_keys:
                if k2 not in batch:
                    continue
                v = batch[k2]
                if k2 == "rgb":
                    v = np.clip(v, 0, 255).astype(np.uint8)
                elif k2 == "class_label":
                    v = v.astype(np.int8)  # 22 classes + ignore=-1
                elif k2 == "boundary":
                    v = v.astype(np.uint8)
                elif k2 == "depth":
                    v = v.astype(np.float16)  # ~0.5 mm at 1 m
                small[k2] = v
            sb = parallel.shard_batch(small, mesh)
            state, loss = step(state, sb)
            k += 1
            if k % 50 == 0:
                log.report(
                    {"main/loss": float(jax.device_get(loss))}, step=k
                )
                print(
                    f"step {k}: loss={float(jax.device_get(loss)):.4f}",
                    flush=True,
                )
            if k >= args.steps:
                break
    if not args.eval_only:
        ckpt.save_latest(state, k)

    # held-out evaluation: mIoU + instance detection rate (+ per-class)
    val = SyntheticInstanceSegmentationDataset(
        split="val",
        n_frames=args.n_val_frames,
        image_shape=tuple(args.image_shape),
        n_objects=tuple(args.n_objects),
        format="instance",
        seed=args.seed + 1,
    )
    params_host = jax.device_get(state.params)
    node = SegmentationNode(
        model, params_host, merge_splits=not args.no_merge,
        min_area=args.min_area,
    )
    mious, matched, n_gt, n_pred = [], 0, 0, 0
    per_class = {}  # cid -> [matched, gt, pred]
    for i in range(len(val)):
        ex = val.get_example(i)
        pred_label, pred_classes = node(
            ex["rgb"], ex["depth"] if args.use_depth else None
        )
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
        # per-class tallies (matched computed per class for the table)
        for cid in set(gt_classes.values()) | set(pred_classes.values()):
            gt_c = {
                k2: v for k2, v in gt_classes.items() if v == cid
            }
            pr_c = {
                k2: v for k2, v in pred_classes.items() if v == cid
            }
            mc, gc, pc = match_instances(
                pred_label, pr_c, ex["instance_label"], gt_c
            )
            acc = per_class.setdefault(int(cid), [0, 0, 0])
            acc[0] += mc
            acc[1] += gc
            acc[2] += pc

    summary = {
        "validation/miou": float(np.mean(mious)),
        "validation/detection_rate": matched / max(n_gt, 1),
        "validation/precision": matched / max(n_pred, 1),
        "validation/n_gt": n_gt,
    }
    log.report(summary, step=k)
    print("validation:", {k2: round(v, 4) for k2, v in summary.items()})
    table = {
        str(cid): dict(
            detection=m / max(g, 1), precision=m / max(p, 1), n_gt=g
        )
        for cid, (m, g, p) in sorted(per_class.items())
    }
    worst = sorted(
        table.items(), key=lambda kv: kv[1]["detection"]
    )[:5]
    table["_summary"] = {
        k2.split("/")[-1]: round(v, 6) if isinstance(v, float) else v
        for k2, v in summary.items()
    }
    pc_name = "per_class_nomerge.json" if args.no_merge else "per_class.json"
    if args.min_area != 50:
        pc_name = pc_name.replace(".json", f"_a{args.min_area}.json")
    with open(os.path.join(args.out, pc_name), "w") as f:
        json.dump(table, f, indent=1)
    print("worst classes:", [(c, round(v["detection"], 2)) for c, v in worst])


if __name__ == "__main__":
    main()
