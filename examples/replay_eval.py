#!/usr/bin/env python
"""Serving-quality experiment on a replayed sequence (VERDICT-3 closure).

Records (or reuses) a 20+-frame cluttered-scene sequence with GT poses,
drives the full ``ScenePipeline`` (fusion -> pose CNN -> n-vote object
mapping -> async ICC [-> ICP]) over it, and scores per-frame ADD of

  raw      — the pose CNN's per-frame prediction stream,
  voted    — the object-mapping track pose (n-vote temporal fusion,
             reference ``object_mapping.py:55-84``),
  refined  — the voted pose after joint collision refinement
             (reference ``collision_based_pose_refinement.py:108-211``),
  refined+icp — ICP against the frame's observed depth on top.

This is the one serving claim the offline eval can't make: that the
runtime stack improves pose quality over the raw stream.

Usage:
  python examples/replay_eval.py --log-dir /root/runs/occ2 \
      --out /root/runs/replay_eval.json [--segmenter /root/runs/seg]
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
import argparse
import json


def record_sequence(out_dir, n_frames, n_objects, seed, image_shape):
    import numpy as np

    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.runtime import SequenceRecorder
    from morefusion_tpu.simulation import PlaneTypeSceneGeneration

    models = ProceduralModels()
    gen = PlaneTypeSceneGeneration(
        models,
        n_object=n_objects,
        random_state=np.random.RandomState(seed),
    )
    gen.generate()
    # interpolate() yields n_points TOTAL camera poses (not per segment):
    # ask for exactly n_frames or the sequence silently comes out short
    traj = gen.random_camera_trajectory(
        n_keypoints=6, n_points=max(2, n_frames)
    )[:n_frames]
    rec = SequenceRecorder(out_dir)
    for k, T_cam in enumerate(traj):
        frame = gen.render_frame(T_cam, shape=tuple(image_shape))
        rec.record(
            frame["rgb"],
            frame["depth"],
            frame["intrinsic_matrix"],
            frame["T_cam2world"],
            instance_label=frame["instance_label"],
            instance_ids=frame["instance_ids"],
            class_ids=frame["class_ids"],
            Ts_cad2cam=frame["Ts_cad2cam"],
            stamp=float(k) / 10.0,
        )
    return out_dir


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", required=True, help="training out dir")
    parser.add_argument("--sequence", default=None,
                        help="recorded sequence dir (generated if absent)")
    parser.add_argument("--n-frames", type=int, default=24)
    parser.add_argument("--n-objects", type=int, default=5)
    parser.add_argument("--image-shape", type=int, nargs=2,
                        default=(240, 320))
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument("--segmenter", default=None,
                        help="UNet checkpoint dir: predicted masks instead "
                        "of GT labels")
    parser.add_argument("--with-icp", action="store_true",
                        help="per-object ICP on the refined poses")
    parser.add_argument("--n-votes", type=int, default=3)
    parser.add_argument("--out", default=None)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from morefusion_tpu import metrics, models, runtime, training
    from morefusion_tpu.contrib import ICPRegistration
    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.datasets.ycb_video.class_names import (
        class_ids_symmetric,
    )
    from morefusion_tpu.runtime import load_sequence

    # ---- model ----
    train_args = training.load_args(args.log_dir)
    n_fg_class = 21
    with_occupancy = train_args.get("with_occupancy", False) or (
        "occupancy" in train_args.get("loss", "")
    )
    model = models.SingleView3D(
        n_fg_class=n_fg_class,
        n_point=train_args.get("n_point", 1000),
        with_occupancy=with_occupancy,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    models_bank = ProceduralModels()
    rng0 = np.random.RandomState(0)
    init_kw = dict(
        class_id=np.ones(1, np.int32),
        rgb=rng0.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng0.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
    )
    if with_occupancy:
        init_kw["grid_nontarget_empty"] = np.zeros(
            (1, 32, 32, 32), np.float32
        )
    params0 = jax.jit(
        lambda r: model.init(r, **init_kw)
    )(jax.random.PRNGKey(0))
    import optax

    from morefusion_tpu.training.trainer import TrainState

    state = TrainState.create(
        apply_fn=model.apply, params=params0, tx=optax.adam(1e-4)
    )
    mgr = training.CheckpointManager(args.log_dir)
    params = mgr.restore_best(state.params, "validation/main/auc")
    if params is None:
        restored = mgr.restore_latest(state)
        params = restored.params if restored is not None else state.params

    # ---- segmenter (optional) ----
    segmenter = None
    if args.segmenter:
        from morefusion_tpu.models.segmentation import (
            SegmentationNode,
            UNetSegmentation,
        )

        seg_args = training.load_args(args.segmenter)
        seg_model = UNetSegmentation(
            n_class=22,
            widths=tuple(seg_args.get("widths", (32, 64, 128, 256))),
            with_boundary=not seg_args.get("no_boundary", False),
            use_depth=seg_args.get("use_depth", False),
        )
        H, W = args.image_shape
        seg_kw = {}
        if seg_model.use_depth:
            seg_kw["depth"] = rng0.rand(1, H, W).astype(np.float32)
        seg_params = jax.jit(
            lambda r, x: seg_model.init(r, x, **seg_kw)
        )(
            jax.random.PRNGKey(0),
            rng0.rand(1, H, W, 3).astype(np.float32),
        )
        seg_state = TrainState.create(
            apply_fn=seg_model.apply, params=seg_params,
            tx=optax.adam(1e-3),
        )
        seg_mgr = training.CheckpointManager(args.segmenter)
        seg_restored = seg_mgr.restore_latest(seg_state)
        if seg_restored is None:
            raise SystemExit(f"no checkpoint in {args.segmenter}")
        segmenter = SegmentationNode(seg_model, seg_restored.params)

    # ---- sequence ----
    seq_dir = args.sequence or os.path.join(args.log_dir, "replay_seq")
    if not os.path.exists(os.path.join(seq_dir, "sequence.json")):
        print(f"recording {args.n_frames}-frame sequence -> {seq_dir}")
        record_sequence(
            seq_dir, args.n_frames, args.n_objects, args.seed,
            args.image_shape,
        )

    pipe = runtime.ScenePipeline(
        model, params, models_bank, segmenter=segmenter,
        native_mapping=True, size_filter=False, n_votes=args.n_votes,
        async_refine=True,
    )
    pipe.warmup()

    sym_set = set(class_ids_symmetric)

    def add_for(class_id, T_est, T_gt):
        """ADD (ADD-S for symmetric classes) of one pose pair."""
        cad = models_bank.get_pcd(class_id)[:500]
        adds, add_ss = metrics.average_distance([cad], [T_gt], [T_est])
        return float(add_ss[0] if class_id in sym_set else adds[0])

    # GT world poses per frame: Ts_cad2cam are per recorded instance
    rows = []
    per_instance_last = {}
    frames = list(load_sequence(seq_dir))
    for fi, frame in enumerate(frames):
        gt_world = {}
        for k, iid in enumerate(frame["instance_ids"]):
            gt_world[int(iid)] = (
                frame["T_cam2world"] @ frame["Ts_cad2cam"][k],
                int(frame["class_ids"][k]),
            )
        kwargs = {}
        if segmenter is None:
            kwargs["instance_label"] = frame["instance_label"]
            kwargs["instance_to_class"] = {
                int(i): int(c)
                for i, c in zip(frame["instance_ids"], frame["class_ids"])
            }
        poses = pipe.process_frame(
            frame["rgb"].astype(np.float32),
            frame["depth"],
            frame["intrinsic_matrix"],
            frame["T_cam2world"],
            refine=True,
            **kwargs,
        )
        # match each pipeline instance to the nearest same-class GT object
        refined_map = pipe.last_refined

        def match_gt(class_id, T_est):
            best, best_d = None, 0.30
            for gid, (T_gt, gcls) in gt_world.items():
                if gcls != class_id:
                    continue
                d = float(
                    np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
                )
                if d < best_d:
                    best, best_d = gid, d
            return best

        for ins_id, res in poses.items():
            T_raw = res["T_cad2world"]
            gid = match_gt(res["class_id"], T_raw)
            if gid is None:
                continue
            T_gt = gt_world[gid][0]
            row = dict(
                frame=fi,
                instance=int(ins_id),
                gt=int(gid),
                class_id=res["class_id"],
                add_raw=add_for(res["class_id"], T_raw, T_gt),
            )
            track = pipe.object_mapping.spawned.get(ins_id)
            if track is not None:
                row["add_voted"] = add_for(
                    res["class_id"], track.pose, T_gt
                )
            T_ref = res.get("T_cad2world_refined")
            if T_ref is None:
                T_ref = refined_map.get(ins_id)
            if T_ref is not None:
                row["add_refined"] = add_for(
                    res["class_id"], T_ref, T_gt
                )
                if args.with_icp:
                    # ICP in the camera frame on observed depth points
                    from morefusion_tpu.geometry.pointcloud import (
                        pointcloud_from_depth,
                    )

                    K = frame["intrinsic_matrix"]
                    pcd = pointcloud_from_depth(
                        frame["depth"], fx=K[0, 0], fy=K[1, 1],
                        cx=K[0, 2], cy=K[1, 2],
                    )
                    lab = frame["instance_label"]
                    # predicted-mask mode has remapped ids; use gt mask
                    mask = lab == gid
                    ok = mask & ~np.isnan(pcd).any(axis=2)
                    pts = pcd[ok]
                    if len(pts) > 10:
                        T_cam = (
                            np.linalg.inv(frame["T_cam2world"]) @ T_ref
                        )
                        reg = ICPRegistration(
                            pts,
                            models_bank.get_pcd(res["class_id"]),
                            T_cam,
                        )
                        T_icp = frame["T_cam2world"] @ reg.register()
                        row["add_refined_icp"] = add_for(
                            res["class_id"], T_icp, T_gt
                        )
            rows.append(row)
            per_instance_last[ins_id] = row
    pipe.flush_refine()

    # ---- summary ----
    def mean_of(key, rows_):
        vals = [r[key] for r in rows_ if key in r]
        return (float(np.mean(vals)), len(vals)) if vals else (None, 0)

    summary = {}
    for key in ("add_raw", "add_voted", "add_refined", "add_refined_icp"):
        m, n = mean_of(key, rows)
        if n:
            summary[key] = dict(mean=m, n=n)
    # steady-state view: second half of the sequence (tracks spawned)
    half = [r for r in rows if r["frame"] >= len(frames) // 2]
    for key in ("add_raw", "add_voted", "add_refined", "add_refined_icp"):
        m, n = mean_of(key, half)
        if n:
            summary[f"{key}_2nd_half"] = dict(mean=m, n=n)
    summary["n_frames"] = len(frames)
    summary["n_rows"] = len(rows)

    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(summary=summary, rows=rows), f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
