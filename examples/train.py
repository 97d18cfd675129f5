#!/usr/bin/env python
"""Train the volumetric pose model (flagship singleview_3d recipe).

Equivalent of ``examples/ycb_video/singleview_3d/train.py`` (reference
recipe: Adam 1e-4, batch 16, 30 epochs, add -> add/add_s after epoch 1,
eval every 0.25 epoch, snapshots latest/best-ADD/best-AUC). Data
parallelism spans all visible devices automatically (shard_map over
Mesh('data')); multi-host runs shard the global batch per process.

With ``--data`` pointing at a reindexed npz set (see
examples/synthetic/generate_data.py); without it, a small synthetic set is
generated inline (smoke-training).
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
    parser.add_argument(
        "--data", default=None, nargs="+",
        help="reindexed/packed dataset dir(s); several dirs are "
        "concatenated (the reference's real+data_syn mixing recipe, "
        "train.py:263-310)",
    )
    parser.add_argument(
        "--balance-sources", action="store_true",
        help="subsample every extra --data source down to the first "
        "source's size (reference RandomSamplingDataset balancing)",
    )
    parser.add_argument("--val-data", default=None)
    parser.add_argument(
        "--model", default="singleview_3d",
        choices=["singleview_3d", "posenet"],
    )
    parser.add_argument("--with-occupancy", action="store_true")
    parser.add_argument(
        "--loss", default="add/add_s",
        choices=["add", "add/add_s", "add+occupancy", "add/add_s+occupancy"],
    )
    parser.add_argument(
        "--min-visibility", type=float, default=0.8,
        help="drop train crops below this visibility. DELIBERATE "
        "DEVIATION from the reference, which computes visibility but "
        "never filters on it (its only crop filter is "
        "nonnan.sum() < n_points_minimal, rgbd_pose_estimation/"
        "base.py:124). Measured justification: training on unfiltered "
        "heavy-clutter crops diverges (val AUC 0.27 -> 0.08; "
        "/root/runs/occ_diverged_nofilter, docs/BENCH_NOTES.md) — "
        "barely-visible instances plus mask-truncation augmentation "
        "feed the point sampler near-empty masks. Val keeps every "
        "instance. Set 0.0 for strict reference parity.",
    )
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument(
        "--lr-schedule", default="constant", choices=["constant", "cosine"],
        help="cosine: warmup + cosine decay to 5%% of --lr over the full "
        "run (the round-3 campaign plateaued on constant 1e-4; decay is "
        "the standard lever at plateau). constant matches the reference "
        "recipe (Adam 1e-4, train.py:339-341)",
    )
    parser.add_argument("--warmup-steps", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--pretrained-model", default=None,
        help="weights-only init from an exported npz checkpoint "
        "(reference train.py:336-337); optimizer starts fresh",
    )
    parser.add_argument(
        "--pretrained-backbone", default=None,
        help="graft a pretrain_backbone.py backbone subtree npz under "
        "the fresh random init (zero-egress stand-in for the "
        "reference's ImageNet ResNet18, morefusion/models/resnet.py:7-52)",
    )
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument(
        "--num-workers", type=int, default=0,
        help="data-loading worker processes (0 = in-process prefetch "
        "thread; use ~half the host cores on a TPU VM)",
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 activation compute for the conv/dense stacks (params, "
        "optimizer state, pose outputs and losses stay fp32 — the "
        "serving-validated mixed-precision recipe, docs/BENCH_NOTES.md)",
    )
    parser.add_argument("--tiny", action="store_true", help="CI-sized model")
    parser.add_argument("--n-point", type=int, default=1000)
    parser.add_argument("--eval-interval", type=float, default=0.25,
                        help="epochs between evaluations")
    parser.add_argument(
        "--rss-exit-gb", type=float, default=0.0,
        help="exit cleanly (code 42, checkpoint saved) when host RSS "
        "exceeds this budget — the TPU relay client leaks a host copy "
        "of every H2D transfer (~3 MB/step), so long runs must be "
        "split across process lives; relaunch with --resume",
    )
    args = parser.parse_args()

    from morefusion_tpu import datasets, models, training
    from morefusion_tpu.datasets import ProceduralModels, Transform

    models_bank = ProceduralModels()
    n_fg_class = 21
    with_occupancy = args.with_occupancy or "occupancy" in args.loss

    device_augment = False
    if args.data:

        def build_train(path):
            if datasets.is_packed(path):
                # packed memmap store: host does only the mask-truncation
                # augmentation; photometric/noise augmentation runs on
                # device (training/augment_device.py), and the batch
                # ships as ONE fp16-z packed buffer (training/transfer.py)
                if not datasets.has_transfer_arrays(path):
                    datasets.derive_transfer_arrays(path)
                return datasets.PackedPoseDataset(
                    path, split="train", augmentation=True, transfer=True,
                    min_visibility=args.min_visibility,
                )
            return datasets.RGBDPoseEstimationDatasetReIndexed(
                path, split="train", augmentation=True,
                min_visibility=args.min_visibility,
            )

        sources = [build_train(p) for p in args.data]
        device_augment = all(
            isinstance(s, datasets.PackedPoseDataset) for s in sources
        )
        if args.balance_sources and len(sources) > 1:
            n0 = len(sources[0])
            sources[1:] = [
                datasets.RandomSamplingDataset(s, n0, seed=args.seed)
                for s in sources[1:]
            ]
        train_ds = (
            sources[0]
            if len(sources) == 1
            else datasets.ConcatDataset(*sources)
        )
        print("train sources:", [len(s) for s in sources])
        val_path = args.val_data or args.data[0]
        if datasets.is_packed(val_path):
            # val rides the compressed transfer too (in-loop eval shipped
            # ~1 GB fp32 pcd per pass through the 24 MB/s relay otherwise)
            if not datasets.has_transfer_arrays(val_path):
                datasets.derive_transfer_arrays(val_path)
            val_ds = datasets.PackedPoseDataset(
                val_path, split="val", transfer=True
            )
        else:
            val_ds = datasets.RGBDPoseEstimationDatasetReIndexed(
                val_path, split="val"
            )
    else:
        print("no --data: generating a small synthetic set inline")
        train_src = datasets.SyntheticRGBDPoseEstimationDataset(
            split="train", n_frames=16, n_objects=(2, 4)
        )
        val_src = datasets.SyntheticRGBDPoseEstimationDataset(
            split="val", n_frames=4, n_objects=(2, 4)
        )
        train_dir = os.path.join(args.out, "data_train")
        val_dir = os.path.join(args.out, "data_val")
        if not os.path.exists(os.path.join(train_dir, "meta.json")):
            datasets.reindex(train_dir, [train_src], n_workers=1)
        if not os.path.exists(os.path.join(val_dir, "meta.json")):
            datasets.reindex(val_dir, [val_src], n_workers=1)
        train_ds = datasets.RGBDPoseEstimationDatasetReIndexed(
            train_dir, split="train", augmentation=True
        )
        val_ds = datasets.RGBDPoseEstimationDatasetReIndexed(
            val_dir, split="val"
        )

    if args.model == "singleview_3d":
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        if args.tiny:
            model = models.tiny_singleview3d(
                n_fg_class, n_point=args.n_point,
                with_occupancy=with_occupancy,
            )
        else:
            model = models.SingleView3D(
                n_fg_class=n_fg_class, n_point=args.n_point,
                with_occupancy=with_occupancy, compute_dtype=dtype,
            )
    else:
        model = models.PoseNet(n_fg_class=n_fg_class, n_point=args.n_point)

    learning_rate = args.lr
    if args.lr_schedule == "cosine":
        import optax

        steps_per_epoch = max(1, len(train_ds) // args.batch_size)
        total_steps = args.max_steps or steps_per_epoch * args.epochs
        learning_rate = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=args.lr,
            warmup_steps=min(args.warmup_steps, max(1, total_steps // 10)),
            decay_steps=total_steps,
            end_value=args.lr * 0.05,
        )
        print(
            f"cosine lr schedule: peak {args.lr}, "
            f"{total_steps} decay steps"
        )

    try:
        state, summary = training.loop.fit(
            model=model,
            models_bank=models_bank,
            train_dataset=train_ds,
            val_dataset=val_ds,
            out_dir=args.out,
            transform_train=Transform(
                train=True, with_occupancy=with_occupancy
            ),
            transform_val=Transform(
                train=False, with_occupancy=with_occupancy
            ),
            n_fg_class=n_fg_class,
            batch_size=args.batch_size,
            epochs=args.epochs,
            learning_rate=learning_rate,
            loss=args.loss,
            with_occupancy=with_occupancy,
            eval_interval=args.eval_interval,
            seed=args.seed,
            resume=args.resume,
            pretrained_model=args.pretrained_model,
            pretrained_backbone=args.pretrained_backbone,
            max_steps=args.max_steps,
            args_dict=vars(args),
            num_workers=args.num_workers,
            device_augment=device_augment,
            rss_exit_gb=args.rss_exit_gb,
        )
    except training.loop.LeakBudgetExit as e:
        print(f"leak-budget exit: {e}")
        raise SystemExit(42)
    print("final summary:", {k: round(v, 4) for k, v in summary.items() if k.count("/") <= 2})


if __name__ == "__main__":
    main()
