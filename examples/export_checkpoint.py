#!/usr/bin/env python
"""Archive a trained run's best params as a git-committable bf16 npz.

Two VM rebuilds have destroyed every orbax snapshot this round; the npz
(plus the run's args.json) is enough to re-evaluate without retraining:
drop both into a fresh log dir and CheckpointManager.restore_best falls
back to ``snapshot_model_best_<metric>.npz`` automatically.

Usage::

  python examples/export_checkpoint.py --log-dir /root/runs/occ \
      --out docs/results/occ_best_bf16.npz
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", required=True)
    parser.add_argument("--metric", default="validation/main/auc")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import jax
    import numpy as np

    from morefusion_tpu import models, training

    train_args = training.load_args(args.log_dir)
    n_fg_class = 21
    with_occupancy = train_args.get("with_occupancy", False) or (
        "occupancy" in train_args.get("loss", "")
    )
    ctor = (
        models.tiny_singleview3d
        if train_args.get("tiny")
        else models.SingleView3D
    )
    kw = dict(
        n_point=train_args.get("n_point", 1000),
        with_occupancy=with_occupancy,
    )
    model = (
        ctor(n_fg_class, **kw)
        if train_args.get("tiny")
        else ctor(n_fg_class=n_fg_class, **kw)
    )
    rng = np.random.RandomState(0)
    init_kw = dict(
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.ones(1, np.float32) * 0.01,
    )
    if with_occupancy:
        init_kw["grid_nontarget_empty"] = np.zeros(
            (1, 32, 32, 32), np.float32
        )
    params = jax.jit(lambda r: model.init(r, **init_kw))(
        jax.random.PRNGKey(0)
    )
    mgr = training.CheckpointManager(args.log_dir)
    restored = mgr.restore_best(params, args.metric)
    if restored is None:
        raise SystemExit(f"no best-{args.metric} snapshot in {args.log_dir}")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    training.export_params_npz(restored, args.out)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
