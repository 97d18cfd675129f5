#!/usr/bin/env python
"""Batched evaluation sweep over runs / grid variants / datasets.

One process, one eval-step compile: the occupancy-ablation grid variants
only change the *host-side* Transform (which grids feed the model), so
sweeping them re-uses the jitted step. Produces the same per-method
summary json as ``examples/evaluate.py --methods morefusion``.

Usage::

  python examples/eval_sweep.py --out-dir /root/runs \
    --sweep occ:observed:/root/data/val_packed \
            occ:nontarget_full:/root/data/val_packed \
            occ:full_bg:/root/data/val_packed \
            noocc:observed:/root/data/val_packed
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
    parser.add_argument("--runs-root", default="/root/runs")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument(
        "--sweep", nargs="+", required=True,
        help="entries run_name:grid_variant:data_dir; output file is "
        "eval_<run>_<variant>[_<dataset-basename>].json",
    )
    parser.add_argument("--batch-size", type=int, default=16)
    args = parser.parse_args()

    import jax
    import numpy as np

    from morefusion_tpu import datasets, models, training
    from morefusion_tpu.datasets import ProceduralModels, Transform

    models_bank = ProceduralModels()
    n_fg_class = 21
    bank = training.CadPointBank.build(models_bank, n_fg_class)

    eval_cases = {
        "observed": "empty+nontarget",
        "nontarget_full": "empty+nontarget_full",
        "full_bg": "empty+nontarget_full+other_full",
    }

    # cache restored params / eval fns / datasets across sweep entries
    run_cache = {}
    ds_cache = {}

    for entry in args.sweep:
        run_name, variant, data = entry.split(":")
        log_dir = os.path.join(args.runs_root, run_name)

        if run_name not in run_cache:
            train_args = training.load_args(log_dir)
            with_occ = train_args.get("with_occupancy", False) or (
                "occupancy" in train_args.get("loss", "")
            )
            model = models.SingleView3D(
                n_fg_class=n_fg_class,
                n_point=train_args.get("n_point", 1000),
                with_occupancy=with_occ,
            )
            eval_step = jax.jit(
                training.make_eval_step(
                    model, bank, with_occupancy=with_occ
                )
            )
            run_cache[run_name] = (model, eval_step, with_occ, None)

        model, eval_step, with_occ, params = run_cache[run_name]

        if data not in ds_cache:
            if datasets.is_packed(data):
                ds_cache[data] = datasets.PackedPoseDataset(
                    data, split="val"
                )
            else:
                ds_cache[data] = (
                    datasets.RGBDPoseEstimationDatasetReIndexed(
                        data, split="val"
                    )
                )
        ds = ds_cache[data]

        transform = Transform(
            train=False,
            with_occupancy=with_occ,
            eval_case=eval_cases[variant],
        )
        loader = training.BatchLoader(
            ds, args.batch_size, transform, shuffle=False, drop_last=False
        )

        if params is None:
            example = next(iter(loader))
            state = training.create_train_state(
                model, example, jax.random.PRNGKey(0),
                with_occupancy=with_occ,
            )
            mgr = training.CheckpointManager(log_dir)
            params = mgr.restore_best(state.params, "validation/main/auc")
            if params is None:
                restored = mgr.restore_latest(state)
                params = (
                    restored.params if restored is not None
                    else state.params
                )
            run_cache[run_name] = (model, eval_step, with_occ, params)

        ev = training.Evaluator()
        B = args.batch_size
        for batch in loader:
            n_b = len(batch["class_id"])
            if n_b < B:  # pad the tail to keep the compiled shape
                take = list(range(n_b)) + [0] * (B - n_b)
                batch = {k: np.asarray(v)[take] for k, v in batch.items()}
            batch["rgb"] = batch["rgb"].astype(np.float32)
            out = {
                k: np.asarray(v)[:n_b]
                for k, v in jax.device_get(eval_step(params, batch)).items()
            }
            ev.add_batch(out)
        summary = ev.summarize()

        tag = f"{run_name}_{variant}"
        base = os.path.basename(os.path.normpath(data))
        if base != "val_packed":
            tag += f"_{base}"
        out_path = os.path.join(args.out_dir, f"eval_{tag}.json")
        with open(out_path, "w") as f:
            json.dump(
                {"morefusion": summary, "records": ev.records()}, f, indent=2
            )
        print(
            f"[{tag}] ADD(-S) AUC={summary['main/add_or_add_s/auc']:.4f} "
            f"ADD-S AUC={summary['main/add_s/auc']:.4f} "
            f"<2cm={summary['main/add_or_add_s/<2cm']:.4f}"
        )


if __name__ == "__main__":
    main()
