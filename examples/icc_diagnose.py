#!/usr/bin/env python
"""Root-cause diagnostics for the neutral ICC refinement result.

The joint refinement table (``docs/results/r4_refine_table_joint.json``)
shows ICC neutral-to-negative even under the reference's scene-level
joint protocol. This script answers WHY, with three measurements over a
sample of frozen-val frames:

1. **Objective landscape**: the ICC loss (and its per-object
   penalty/reward parts) evaluated at the GROUND-TRUTH poses vs the
   CNN-predicted poses. If ``loss(GT) >= loss(pred)`` on this data, the
   objective's minimum is not at the true configuration — no descent
   procedure can help, however faithful the protocol.
2. **Collision signal**: the penalty component at the predicted poses.
   The paper's mechanism (reference
   ``iterative_collision_check_link.py:91-98``) only fires when
   predicted inside-grids overlap other objects' occupancy or observed
   free space; if penalty(pred) is already ~penalty(GT), there is no
   intersection for ICC to resolve.
3. **Descent-vs-accuracy alignment**: per-frame correlation between the
   achieved loss decrease and the change in mean ADD. A negative or
   near-zero correlation means minimizing this objective does not move
   poses toward GT on this data.

Run with ``--grid-variant nontarget_full`` to repeat the analysis with
perfect (full CAD) nontarget occupancy — isolating observed-grid noise
from the objective itself.

Usage:
  python examples/icc_diagnose.py --log-dir /root/runs/occ \
      --data /root/data/val_packed --n-frames 60 \
      --out docs/results/r4_icc_diagnosis_observed.json
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import json


def main(args):
    import jax
    import numpy as np

    from morefusion_tpu import datasets, metrics, models, training
    from morefusion_tpu.contrib import IterativeCollisionCheck
    from morefusion_tpu.datasets import ProceduralModels, Transform
    from morefusion_tpu.datasets.ycb_video.class_names import (
        class_ids_symmetric,
    )
    from morefusion_tpu.functions import transformation_matrix

    train_args = training.load_args(args.log_dir)
    n_fg_class = 21
    with_occupancy = train_args.get("with_occupancy", False) or (
        "occupancy" in train_args.get("loss", "")
    )
    model = models.SingleView3D(
        n_fg_class=n_fg_class,
        n_point=train_args.get("n_point", 1000),
        with_occupancy=with_occupancy,
    )
    models_bank = ProceduralModels()
    if datasets.is_packed(args.data):
        ds = datasets.PackedPoseDataset(args.data, split="val")
    else:
        ds = datasets.RGBDPoseEstimationDatasetReIndexed(
            args.data, split="val"
        )
    eval_case = {
        "observed": "empty+nontarget",
        "nontarget_full": "empty+nontarget_full",
        "full_bg": "empty+nontarget_full+other_full",
    }[args.grid_variant]
    transform = Transform(
        train=False, with_occupancy=with_occupancy, eval_case=eval_case
    )

    loader = training.BatchLoader(ds, 1, transform, shuffle=False)
    example = next(iter(loader))
    state = training.create_train_state(
        model, example, jax.random.PRNGKey(0),
        with_occupancy=with_occupancy,
    )
    mgr = training.CheckpointManager(args.log_dir)
    params = mgr.restore_best(state.params, "validation/main/auc")
    if params is None:
        restored = mgr.restore_latest(state)
        params = restored.params if restored is not None else state.params

    # frame grouping (packed index "frame/instance" ids)
    ex_ids = (
        ds.example_ids
        if hasattr(ds, "example_ids")
        else [str(i) for i in range(len(ds))]
    )
    frames = {}
    for i in range(len(ds)):
        frames.setdefault(ex_ids[i].split("/")[0], []).append(i)
    frame_items = list(frames.items())
    if args.n_frames:
        frame_items = frame_items[: args.n_frames]

    @jax.jit
    def predict_one(params, batch):
        kwargs = dict(
            class_id=batch["class_id"], rgb=batch["rgb"],
            pcd=batch["pcd"], pitch=batch["pitch"],
        )
        if with_occupancy:
            kwargs["origin"] = batch["origin"]
            kwargs["grid_nontarget_empty"] = batch["grid_nontarget_empty"]
        quat, trans, conf = model.apply(params, **kwargs)
        import jax.numpy as jnp

        b = jnp.argmax(conf, axis=1)
        ar = jnp.arange(quat.shape[0])
        return quat[ar, b], trans[ar, b]

    def add_of(cid, T_true, T):
        cad = models_bank.get_pcd(cid)
        add, add_s = metrics.average_distance([cad], [T_true], [T])
        return float(
            add_s[0] if cid in class_ids_symmetric else add[0]
        )

    rows = []
    for fi, (frame, idxs) in enumerate(frame_items):
        exs = [transform(ds[i]) for i in idxs]
        B = len(exs)
        batch = {
            k: np.stack([np.asarray(ex[k]) for ex in exs])
            for k in (
                ("class_id", "rgb", "pcd", "pitch", "origin",
                 "grid_nontarget_empty")
                if with_occupancy
                else ("class_id", "rgb", "pcd", "pitch")
            )
        }
        batch["rgb"] = batch["rgb"].astype(np.float32)
        if with_occupancy:
            batch["grid_nontarget_empty"] = batch[
                "grid_nontarget_empty"
            ].astype(np.float32)
        # pad to a fixed batch so every frame reuses ONE compiled
        # predict (a per-object-count batch would recompile through the
        # relay for each distinct N)
        PB = 16
        if B < PB:
            take = list(range(B)) + [0] * (PB - B)
            batch = {k: np.asarray(v)[take] for k, v in batch.items()}
        q, t = map(np.asarray, predict_one(params, batch))
        q, t = q[:B], t[:B]
        T_pred = [
            np.asarray(transformation_matrix(q[k], t[k])).astype(
                np.float64
            )
            for k in range(B)
        ]
        T_true = [
            np.asarray(
                transformation_matrix(
                    ex["quaternion_true"], ex["translation_true"]
                )
            ).astype(np.float64)
            for ex in exs
        ]
        if args.perturb_t or args.perturb_r:
            # perturbation-recovery mode: start from GT + gross noise —
            # the interpenetration regime ICC is built for (the ROS
            # stream hands it colliding hypotheses,
            # collision_based_pose_refinement.py:108-211). Recovery here
            # with no recovery from CNN predictions = regime effect,
            # not an implementation defect.
            prng = np.random.RandomState(
                args.perturb_seed + int(frame, 10)
            )
            T_pred = []
            for Tt in T_true:
                P = np.eye(4)
                axis = prng.normal(size=3)
                axis /= np.linalg.norm(axis)
                ang = np.deg2rad(args.perturb_r) * prng.normal()
                K = np.array(
                    [
                        [0, -axis[2], axis[1]],
                        [axis[2], 0, -axis[0]],
                        [-axis[1], axis[0], 0],
                    ]
                )
                P[:3, :3] = (
                    np.eye(3)
                    + np.sin(ang) * K
                    + (1 - np.cos(ang)) * K @ K
                )
                P[:3, 3] = args.perturb_t * prng.normal(size=3)
                T_p = Tt.copy()
                T_p[:3, :3] = P[:3, :3] @ Tt[:3, :3]
                T_p[:3, 3] = Tt[:3, 3] + P[:3, 3]
                T_pred.append(T_p)

        icc = IterativeCollisionCheck(
            T_pred,
            [
                models_bank.get_solid_voxel_grid(
                    int(ex["class_id"])
                ).points.astype(np.float32)
                for ex in exs
            ],
            [
                models_bank.get_solid_voxel_grid(
                    int(ex["class_id"])
                ).inside_distance.astype(np.float32)
                for ex in exs
            ],
            [float(ex["pitch"]) for ex in exs],
            [
                np.asarray(ex.get("origin", np.zeros(3)), np.float64)
                for ex in exs
            ],
            np.stack(
                [np.asarray(ex["grid_target"], np.float32) for ex in exs]
            ),
            np.stack(
                [
                    np.asarray(ex["grid_nontarget_empty"], np.float32)
                    for ex in exs
                ]
            ),
            max_points=2048,
            cross_mode=args.icc_cross_mode,
        )
        loss_pred, pen_pred, rew_pred = icc.loss_components()
        loss_gt, pen_gt, rew_gt = icc.loss_components(T_true)
        refined, losses, n_iter = icc.refine(
            iterations=args.iterations,
            alpha=args.alpha,
            early_stop=not args.no_early_stop,
            alpha_decay=args.alpha_decay,
        )
        loss_ref, pen_ref, rew_ref = icc.loss_components()

        cids = [int(ex["class_id"]) for ex in exs]
        add_pred = [
            add_of(c, Tt, Tp) for c, Tt, Tp in zip(cids, T_true, T_pred)
        ]
        add_ref = [
            add_of(c, Tt, Tr) for c, Tt, Tr in zip(cids, T_true, refined)
        ]
        rows.append(
            dict(
                frame=frame,
                n_objects=B,
                n_iter=int(n_iter),
                loss_pred=loss_pred,
                loss_gt=loss_gt,
                loss_refined=loss_ref,
                penalty_pred=[float(x) for x in pen_pred],
                penalty_gt=[float(x) for x in pen_gt],
                penalty_refined=[float(x) for x in pen_ref],
                reward_pred=[float(x) for x in rew_pred],
                reward_gt=[float(x) for x in rew_gt],
                reward_refined=[float(x) for x in rew_ref],
                add_pred=add_pred,
                add_refined=add_ref,
            )
        )
        if fi % 10 == 0:
            print(
                f"[{fi}/{len(frame_items)}] {frame}: "
                f"loss pred={loss_pred:+.4f} gt={loss_gt:+.4f} "
                f"refined={loss_ref:+.4f}  "
                f"mean ADD {np.mean(add_pred):.4f}->"
                f"{np.mean(add_ref):.4f}",
                flush=True,
            )

    # ---- summary ----------------------------------------------------
    lp = np.array([r["loss_pred"] for r in rows])
    lg = np.array([r["loss_gt"] for r in rows])
    lr = np.array([r["loss_refined"] for r in rows])
    dadd = np.array(
        [
            np.mean(r["add_refined"]) - np.mean(r["add_pred"])
            for r in rows
        ]
    )
    dloss = lr - lp
    pen_p = np.concatenate([r["penalty_pred"] for r in rows])
    pen_g = np.concatenate([r["penalty_gt"] for r in rows])
    summary = dict(
        grid_variant=args.grid_variant,
        iterations=args.iterations,
        alpha=args.alpha,
        alpha_decay=args.alpha_decay,
        early_stop=not args.no_early_stop,
        perturb_t=args.perturb_t,
        perturb_r=args.perturb_r,
        n_frames=len(rows),
        loss_pred_mean=float(lp.mean()),
        loss_gt_mean=float(lg.mean()),
        loss_refined_mean=float(lr.mean()),
        frac_gt_below_pred=float((lg < lp).mean()),
        frac_refined_below_gt=float((lr < lg).mean()),
        penalty_pred_mean=float(pen_p.mean()),
        penalty_gt_mean=float(pen_g.mean()),
        corr_dloss_dadd=float(np.corrcoef(dloss, dadd)[0, 1])
        if len(rows) > 2
        else None,
        mean_dadd=float(dadd.mean()),
        add_init_mean=float(
            np.mean(np.concatenate([r["add_pred"] for r in rows]))
        ),
        add_refined_mean=float(
            np.mean(np.concatenate([r["add_refined"] for r in rows]))
        ),
    )
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(summary=summary, frames=rows), f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--log-dir", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--n-frames", type=int, default=60)
    parser.add_argument(
        "--grid-variant",
        default="observed",
        choices=["observed", "nontarget_full", "full_bg"],
    )
    parser.add_argument(
        "--icc-cross-mode", default="resample",
        choices=["resample", "exact"],
    )
    parser.add_argument("--iterations", type=int, default=30)
    parser.add_argument("--alpha", type=float, default=0.01)
    parser.add_argument(
        "--alpha-decay", action="store_true",
        help="cosine-decay the refinement LR to 0 over the iteration "
        "budget (offline convergence; the reference's streaming calls "
        "use a fixed alpha)",
    )
    parser.add_argument(
        "--perturb-t", type=float, default=0.0,
        help="perturbation-recovery mode: replace the CNN prediction "
        "with GT + N(0, sigma) translation noise (meters per axis)",
    )
    parser.add_argument(
        "--perturb-r", type=float, default=0.0,
        help="rotation noise sigma (degrees, random axis) for "
        "perturbation-recovery mode",
    )
    parser.add_argument("--perturb-seed", type=int, default=7)
    parser.add_argument(
        "--no-early-stop", action="store_true",
        help="disable the plateau early-stop (its 0.009 threshold was "
        "tuned to a different loss scale and fires at ~iter 13 here)",
    )
    parser.add_argument("--out", default=None)
    main(parser.parse_args())
