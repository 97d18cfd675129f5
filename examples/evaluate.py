#!/usr/bin/env python
"""Evaluate a trained pose model: raw / +ICP / +ICC+ICP.

Equivalent of ``examples/ycb_video/singleview_3d/evaluate.py``: loads
args.json + the best snapshot, runs per-example prediction (deterministic
sampling), records ADD/ADD-S per method, and prints per-class VOCap AUC
tables. Methods mirror the reference: "morefusion", "morefusion+icp",
"morefusion+icc+icp".
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", required=True, help="training out dir")
    parser.add_argument("--data", required=True, help="reindexed val set")
    parser.add_argument("--n-examples", type=int, default=None)
    parser.add_argument("--methods", nargs="+",
                        default=["morefusion", "morefusion+icp"])
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 activation compute (fp32 params; ~1.5x inference "
        "throughput on TPU at negligible pose delta)",
    )
    parser.add_argument(
        "--grid-variant",
        default="observed",
        choices=["observed", "nontarget_full", "full_bg"],
        help="occupancy-grid quality at eval (the ablation axis, "
        "reference docs/index.html:200-203): observed maps (MF) / full "
        "nontarget CAD grids (+target-) / ~grid_target_full (+target-+bg)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=16,
        help="batched fast path for refinement-free methods",
    )
    parser.add_argument(
        "--icc-protocol", default="joint", choices=["joint", "single"],
        help="joint: refine all objects of a frame together (the "
        "reference protocol - cross-object collision terms fire); "
        "single: per-crop N=1 (rounds 1-3 behavior, for comparison)",
    )
    parser.add_argument(
        "--icc-iterations", type=int, default=30,
        help="ICC optimization steps. 30 matches the reference link's "
        "per-call budget, but offline (no warm-started stream) the "
        "icc_diagnose.py landscape probe shows 30 Adam steps close only "
        "a fraction of the loss(pred)->loss(GT) gap; use ~150 with "
        "--icc-no-early-stop for the converged offline protocol",
    )
    parser.add_argument(
        "--icc-alpha-decay", action="store_true",
        help="cosine-decay the ICC LR over the iteration budget "
        "(offline converged protocol; see ROUND4.md 2b)",
    )
    parser.add_argument(
        "--icc-no-early-stop", action="store_true",
        help="disable the plateau early-stop (its |dloss|<0.009 window "
        "threshold is scaled to the ROS stream's loss deltas and fires "
        "by ~iter 13 on this data)",
    )
    parser.add_argument(
        "--icc-cross-mode", default="resample",
        choices=["resample", "exact"],
        help="cross-object inside-grid construction (see contrib."
        "collision_refine.icc_loss)",
    )
    parser.add_argument(
        "--icc-grid-scale", type=int, default=1,
        help="refine-time grid resolution factor: trilinearly upsample "
        "the observed grids to (32*s)^3 at pitch/s before ICC. Probes "
        "the ROUND4.md 2b resolution bound (reward basin ~= threshold x "
        "pitch ~= 12 mm at the training pitch vs ~11 mm median position "
        "error); the reference likewise uses refinement pitches "
        "decoupled from the CNN grid (ros/.../utils/data.h:9-37)",
    )
    parser.add_argument(
        "--icc-threshold", type=float, default=2.0,
        help="pseudo-occupancy ramp width in voxels (reference default "
        "2); the blur of the ICC objective is threshold x pitch",
    )
    parser.add_argument(
        "--icc-coarse-to-fine", action="store_true",
        help="two-level schedule: full iteration budget at the native "
        "32^3 pitch, then again at --icc-grid-scale from the coarse "
        "result (escape flat-basin wandering at range, then sharpen)",
    )
    args = parser.parse_args()

    import jax
    import numpy as np

    from morefusion_tpu import datasets, metrics, models, training
    from morefusion_tpu.contrib import ICPRegistration, IterativeCollisionCheck
    from morefusion_tpu.contrib.collision_refine import upsample_observed_grid
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
    import jax.numpy as jnp

    dtype_kw = dict(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    if train_args.get("tiny"):
        model = models.tiny_singleview3d(
            n_fg_class, n_point=train_args.get("n_point", 1000),
            with_occupancy=with_occupancy, **dtype_kw,
        )
    else:
        model = models.SingleView3D(
            n_fg_class=n_fg_class,
            n_point=train_args.get("n_point", 1000),
            with_occupancy=with_occupancy, **dtype_kw,
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

    # restore best-AUC params (fall back to latest trainer state)
    bank = training.CadPointBank.build(models_bank, n_fg_class)
    loader = training.BatchLoader(ds, 1, transform, shuffle=False)
    example = next(iter(loader))
    state = training.create_train_state(
        model, example, jax.random.PRNGKey(0), with_occupancy=with_occupancy
    )
    mgr = training.CheckpointManager(args.log_dir)
    params = mgr.restore_best(state.params, "validation/main/auc")
    if params is None:
        restored = mgr.restore_latest(state)
        params = restored.params if restored is not None else state.params

    eval_step = jax.jit(
        training.make_eval_step(model, bank, with_occupancy=with_occupancy)
    )

    n = len(ds) if args.n_examples is None else min(args.n_examples, len(ds))
    records = {m: [] for m in args.methods}
    import time as _time

    # refinement-free methods ride the batched eval step (one dispatch per
    # batch instead of one per example — the relay round trip dominates)
    fast_methods = [m for m in args.methods if m == "morefusion"]
    slow_methods = [m for m in args.methods if m != "morefusion"]
    if fast_methods:
        loader_n = training.BatchLoader(
            ds, args.batch_size, transform, shuffle=False,
            indices=np.arange(n), drop_last=False,
        )
        _t0 = _time.time()
        done = 0
        for batch in loader_n:
            B = len(batch["class_id"])
            if B < args.batch_size:  # pad the tail batch
                pad = [0] * (args.batch_size - B)
                take = list(range(B)) + pad
                batch = {k: np.asarray(v)[take] for k, v in batch.items()}
            batch["rgb"] = batch["rgb"].astype(np.float32)
            out = jax.device_get(eval_step(params, batch))
            for b in range(B):
                cid = int(out["class_id"][b])
                records["morefusion"].append(
                    dict(
                        class_id=cid,
                        add=float(out["add"][b]),
                        add_s=float(out["add_s"][b]),
                        add_or_add_s=float(
                            out["add_s"][b]
                            if cid in class_ids_symmetric
                            else out["add"][b]
                        ),
                    )
                )
            done += B
            if done % (args.batch_size * 8) == 0:
                rate = done / (_time.time() - _t0)
                print(f"  [fast] {done}/{n} ({rate:.1f} ex/s)", flush=True)
        for m in fast_methods[1:]:
            records[m] = list(records["morefusion"])

    # ---- refinement methods: one shared protocol -------------------
    #
    # 1. ONE batched prediction pass produces the best-confidence pose
    #    per crop (identical inputs/sampling to the fast path above), so
    #    every method in the table starts from the same raw poses.
    # 2. Crops are grouped by FRAME and all N objects of a frame are
    #    refined JOINTLY by ICC — the reference protocol (the ROS driver
    #    batches every live object into one IterativeCollisionCheckLink,
    #    ``collision_based_pose_refinement.py:108-211``; each object's
    #    no-entry grid gains the other objects' inside-grids,
    #    ``iterative_collision_check_link.py:65-85``). ``--icc-protocol
    #    single`` keeps the old per-crop N=1 variant for comparison.
    # 3. All refined methods (and the ``morefusion(host)`` cross-check
    #    row) are scored identically on the host: full CAD point cloud,
    #    ``metrics.average_distance``.
    if slow_methods:
        # frame grouping from the packed index's "frame/instance" ids
        if hasattr(ds, "example_ids"):
            ex_ids = ds.example_ids
        else:  # no frame identity -> every crop is its own scene
            ex_ids = [str(i) for i in range(len(ds))]
        frames = {}
        for i in range(n):
            frames.setdefault(ex_ids[i].split("/")[0], []).append(i)

        # shared prediction pass (batched; argmax-confidence per crop)
        @jax.jit
        def predict_best(params, batch):
            kwargs = dict(
                class_id=batch["class_id"], rgb=batch["rgb"],
                pcd=batch["pcd"], pitch=batch["pitch"],
            )
            if with_occupancy:
                kwargs["origin"] = batch["origin"]
                kwargs["grid_nontarget_empty"] = batch[
                    "grid_nontarget_empty"
                ]
            quat, trans, conf = model.apply(params, **kwargs)
            import jax.numpy as jnp

            b = jnp.argmax(conf, axis=1)
            ar = jnp.arange(quat.shape[0])
            return quat[ar, b], trans[ar, b]

        loader_p = training.BatchLoader(
            ds, args.batch_size, transform, shuffle=False,
            indices=np.arange(n), drop_last=False,
        )
        q_pred = np.zeros((n, 4), np.float32)
        t_pred = np.zeros((n, 3), np.float32)
        done = 0
        for batch in loader_p:
            B = len(batch["class_id"])
            if B < args.batch_size:
                pad = [0] * (args.batch_size - B)
                take = list(range(B)) + pad
                batch = {k: np.asarray(v)[take] for k, v in batch.items()}
            batch["rgb"] = batch["rgb"].astype(np.float32)
            if with_occupancy:
                batch["grid_nontarget_empty"] = batch[
                    "grid_nontarget_empty"
                ].astype(np.float32)
            q, t = map(np.asarray, predict_best(params, batch))
            q_pred[done:done + B] = q[:B]
            t_pred[done:done + B] = t[:B]
            done += B
        T_pred_all = np.zeros((n, 4, 4))
        for i in range(n):
            T_pred_all[i] = np.asarray(
                transformation_matrix(q_pred[i], t_pred[i])
            ).astype(np.float64)

        want_icc = any("icc" in m for m in slow_methods)
        host_raw = "morefusion(host)"
        if host_raw not in records:
            records[host_raw] = []

        def record(method, index, class_id, T_true, T):
            cad = models_bank.get_pcd(class_id)
            is_sym = class_id in class_ids_symmetric
            add, add_s = metrics.average_distance([cad], [T_true], [T])
            records[method].append(
                dict(
                    class_id=class_id,
                    add=float(add[0]),
                    add_s=float(add_s[0]),
                    add_or_add_s=float(add_s[0] if is_sym else add[0]),
                )
            )

        _t0 = _time.time()
        for fi, (frame, idxs) in enumerate(frames.items()):
            if fi and fi % 10 == 0:
                rate = fi / (_time.time() - _t0)
                print(
                    f"  [refine] frame {fi}/{len(frames)} "
                    f"({rate:.2f} frames/s)", flush=True,
                )
            exs = [transform(ds[i]) for i in idxs]
            T_true_l = [
                np.asarray(
                    transformation_matrix(
                        ex["quaternion_true"], ex["translation_true"]
                    )
                ).astype(np.float64)
                for ex in exs
            ]

            T_icc = None
            if want_icc:
                if args.icc_protocol == "joint":
                    groups = [list(range(len(idxs)))]
                else:  # "single": each object refined alone (old path)
                    groups = [[k] for k in range(len(idxs))]
                T_icc = [None] * len(idxs)
                for group in groups:
                    Ts0, pts_l, sdf_l, pitch_l, origin_l = [], [], [], [], []
                    g_t, g_ne = [], []
                    for k in group:
                        ex = exs[k]
                        cid = int(ex["class_id"])
                        vox = models_bank.get_solid_voxel_grid(cid)
                        Ts0.append(T_pred_all[idxs[k]])
                        pts_l.append(vox.points.astype(np.float32))
                        sdf_l.append(
                            vox.inside_distance.astype(np.float32)
                        )
                        pitch_l.append(float(ex["pitch"]))
                        origin_l.append(
                            np.asarray(
                                ex.get("origin", np.zeros(3)), np.float64
                            )
                        )
                        g_t.append(np.asarray(ex["grid_target"], np.float32))
                        g_ne.append(
                            np.asarray(
                                ex["grid_nontarget_empty"], np.float32
                            )
                        )

                    def run_icc(Ts_init, scale):
                        icc = IterativeCollisionCheck(
                            Ts_init, pts_l, sdf_l,
                            [p / scale for p in pitch_l], origin_l,
                            np.stack(
                                [upsample_observed_grid(g, scale)
                                 for g in g_t]
                            ),
                            np.stack(
                                [upsample_observed_grid(g, scale)
                                 for g in g_ne]
                            ),
                            voxel_dim=32 * scale,
                            threshold=args.icc_threshold,
                            max_points=2048,
                            cross_mode=args.icc_cross_mode,
                        )
                        refined, _, _ = icc.refine(
                            iterations=args.icc_iterations,
                            early_stop=not args.icc_no_early_stop,
                            alpha_decay=args.icc_alpha_decay,
                        )
                        return refined

                    Ts_init = Ts0
                    if args.icc_coarse_to_fine and args.icc_grid_scale > 1:
                        Ts_init = list(run_icc(Ts_init, 1))
                    refined = run_icc(Ts_init, args.icc_grid_scale)
                    for j, k in enumerate(group):
                        T_icc[k] = refined[j]

            for k, i in enumerate(idxs):
                ex = exs[k]
                cid = int(ex["class_id"])
                T_true = T_true_l[k]
                record(host_raw, i, cid, T_true, T_pred_all[i])

                mask = ~np.isnan(ex["pcd"]).any(axis=2)
                depth_points = ex["pcd"][mask]

                def icp(T):
                    if len(depth_points) > 10:
                        return ICPRegistration(
                            depth_points, models_bank.get_pcd(cid), T
                        ).register()
                    return T

                for method in slow_methods:
                    if "icc" in method:
                        T = T_icc[k].copy()
                    else:
                        T = T_pred_all[i].copy()
                    if "icp" in method:
                        T = icp(T)
                    record(method, i, cid, T_true, T)

    print(f"evaluated {n} examples")
    summary = {}
    for method, recs in records.items():
        class_ids = np.array([r["class_id"] for r in recs])
        adds = {
            k: np.array([r[k] for r in recs])
            for k in ("add", "add_s", "add_or_add_s")
        }
        s = training.summarize_records(class_ids, adds)
        summary[method] = s
        print(
            f"[{method}] ADD(-S) AUC={s['main/add_or_add_s/auc']:.4f} "
            f"ADD-S AUC={s['main/add_s/auc']:.4f} "
            f"<2cm={s['main/add_or_add_s/<2cm']:.4f}"
        )
    if args.out:
        dump = dict(summary)
        dump["records"] = {
            m: {
                "class_id": [int(r["class_id"]) for r in recs],
                **{
                    k: [float(r[k]) for r in recs]
                    for k in ("add", "add_s", "add_or_add_s")
                },
            }
            for m, recs in records.items()
        }
        with open(args.out, "w") as f:
            json.dump(dump, f, indent=2)


if __name__ == "__main__":
    main()
