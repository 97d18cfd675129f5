"""The full training loop (reference train.py trainer assembly, TPU-native).

Reproduces the reference recipe (``examples/ycb_video/singleview_3d/
train.py:143-492``): Adam 1e-4, loss schedule ``add -> add/add_s`` after
epoch 1, evaluation every 0.25 epoch with per-class ADD AUC, snapshots
latest / best-ADD / best-AUC, log.json + args.json provenance — data
parallel over all local devices via shard_map, multi-host-ready
(rank-0-only I/O; per-process batch shard).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import jax
import numpy as np

from .. import parallel
from .checkpoints import CheckpointManager
from .data import BatchLoader
from .evaluator import Evaluator
from .reporting import LogReport, write_args
from .trainer import (
    CadPointBank,
    create_train_state,
    make_dp_eval_step,
    make_dp_train_step,
    stack_examples,
)
from .transfer import TransferSchema


class LeakBudgetExit(Exception):
    """Raised after a clean checkpoint save when host RSS crosses the
    budget — the relay client leaks a host-side copy of every H2D
    transfer (~payload bytes per train step, measured ~2.9 MB/step),
    so a 30-epoch run exhausts memory in one process life. The driver
    (chain script) relaunches with ``--resume``; exit code 42."""


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def _reconstruct_pcd_np(batch: dict) -> dict:
    """Host twin of ``transfer.reconstruct_pcd`` for init-time examples."""
    batch = dict(batch)
    z = np.asarray(batch.pop("z"), np.float32)
    coef = np.asarray(batch.pop("pcd_coef"), np.float32)
    B, H, W = z.shape
    j = np.arange(W, dtype=np.float32)
    i = np.arange(H, dtype=np.float32)
    x = z * (coef[:, 0, None, None] + coef[:, 1, None, None] * j)
    y = z * (coef[:, 2, None, None] + coef[:, 3, None, None] * i[:, None])
    batch["pcd"] = np.stack([x, y, z], axis=-1)
    return batch


def _pipe_stage(src_iter, fn, stop, depth: int = 2):
    """Run ``fn`` over ``src_iter`` in a worker thread, yielding results.

    Bounded puts re-check ``stop`` so an early-exiting consumer never
    leaves the worker blocked on a full queue (leaking the thread and its
    queued buffers); exceptions propagate to the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in src_iter:
                if stop.is_set():
                    return
                if not _put(fn(item)):
                    return
        except Exception as e:
            _put(e)
            return
        _put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def _prefetch_to_device(host_iter, to_device, depth: int = 2):
    """Two-stage pipeline: host batch prep || pack+transfer || dispatch.

    Through the relay a batch transfer costs ~payload/24 MB/s plus relay-
    process CPU. Splitting prep (pure NumPy, holds the GIL) from
    ``to_device`` (mostly GIL-released IO wait inside PJRT) lets the
    transfer of batch k overlap the prep of batch k+1 even on a single
    host core, and both overlap the device's compute of batch k-1.
    """
    stop = threading.Event()
    try:
        prepped = _pipe_stage(host_iter, lambda hb: hb, stop, depth)
        yield from _pipe_stage(prepped, to_device, stop, depth)
    finally:
        stop.set()


def fit(
    *,
    model,
    models_bank,
    train_dataset,
    val_dataset,
    out_dir: str,
    transform_train,
    transform_val,
    n_fg_class: int,
    batch_size: int = 16,
    epochs: int = 30,
    learning_rate: float = 1e-4,
    loss: str = "add/add_s",
    with_occupancy: bool = False,
    occupancy_scale: float = 1.0,
    eval_interval: float = 0.25,
    log_interval: int = 20,
    seed: int = 0,
    resume: bool = False,
    pretrained_model: Optional[str] = None,
    pretrained_backbone: Optional[str] = None,
    max_steps: Optional[int] = None,
    args_dict: Optional[dict] = None,
    num_workers: int = 0,
    device_augment: bool = False,
    val_batch_size: Optional[int] = None,
    rss_exit_gb: float = 0.0,
):
    """Train; returns (state, final eval summary)."""
    is_primary = jax.process_index() == 0
    if is_primary:
        write_args(out_dir, args_dict or {})
    log = LogReport(out_dir) if is_primary else None
    ckpt = CheckpointManager(out_dir) if is_primary else None

    mesh = parallel.data_mesh()
    bank = CadPointBank.build(
        models_bank, n_fg_class, with_solid=with_occupancy
    )

    train_loader = BatchLoader(
        train_dataset,
        batch_size,
        transform_train,
        shuffle=True,
        seed=seed,
        num_workers=num_workers,
    )
    # reference valid iterator batch = 48 (train.py:360-365): fewer,
    # larger eval dispatches matter through the relay
    val_loader = BatchLoader(
        val_dataset,
        val_batch_size or 48,
        transform_val,
        shuffle=False,
        drop_last=True,
        num_workers=num_workers,
    )

    # init from one example batch
    example = next(iter(train_loader))
    transfer_schema = None
    if "z" in example:  # packed single-buffer transfer path
        transfer_schema = TransferSchema(example)
        example = _reconstruct_pcd_np(example)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(
        model, example, rng, learning_rate, with_occupancy=with_occupancy
    )
    if pretrained_model:
        # weights-only init from an exported npz archive (the reference's
        # --pretrained-model load_npz, train.py:336-337); optimizer state
        # and step start fresh
        from .checkpoints import import_params_npz

        state = state.replace(
            params=import_params_npz(state.params, pretrained_model)
        )
        print(f"initialized params from {pretrained_model}")
    if pretrained_backbone:
        # graft only the 2D extractor subtree (pretrain_backbone.py
        # export contract); everything else keeps its fresh init —
        # the zero-egress analogue of the reference's ImageNet-init
        # ResNet18 (morefusion/models/resnet.py:7-52)
        from .checkpoints import import_backbone_npz

        state = state.replace(
            params=import_backbone_npz(state.params, pretrained_backbone)
        )
        print(f"initialized backbone from {pretrained_backbone}")
    if resume and ckpt is not None:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored

    train_step = make_dp_train_step(
        model,
        bank,
        mesh,
        with_occupancy=with_occupancy,
        # the occupancy grids feed the model whenever with_occupancy; the
        # occupancy *loss term* only for the explicit "+occupancy" loss
        # variant (reference train.py:204-219 — not the default recipe)
        occupancy_loss_term="occupancy" in loss,
        occupancy_scale=occupancy_scale,
        augment=device_augment,
        transfer_schema=transfer_schema,
    )
    # the val path rides the same single-buffer compressed transfer when
    # its dataset carries the z/coef form — the uncompressed path shipped
    # ~1 GB fp32 pcd per eval (55 batches x ~19 MB) through the relay
    val_example = next(iter(val_loader))
    val_schema = TransferSchema(val_example) if "z" in val_example else None
    eval_step = make_dp_eval_step(
        model, bank, mesh, with_occupancy=with_occupancy,
        transfer_schema=val_schema,
    )

    state = parallel.replicate(state, mesh)

    from jax.sharding import NamedSharding, PartitionSpec

    buf_sharding = NamedSharding(mesh, PartitionSpec("data"))

    if transfer_schema is not None:

        def to_device(hb):
            return jax.device_put(transfer_schema.pack(hb), buf_sharding)

    else:

        def to_device(hb):
            return parallel.shard_batch(hb, mesh)

    if val_schema is not None:

        def val_to_device(hb):
            return jax.device_put(val_schema.pack(hb), buf_sharding)

    else:

        def val_to_device(hb):
            return parallel.shard_batch(hb, mesh)

    steps_per_epoch = max(len(train_loader), 1)
    eval_every = max(int(steps_per_epoch * eval_interval), 1)
    total_steps = (
        epochs * steps_per_epoch if max_steps is None else max_steps
    )

    def run_eval(params):
        ev = Evaluator()
        for batch in val_loader:
            out = eval_step(params, val_to_device(batch))
            ev.add_batch(jax.device_get(out))
        return ev.summarize()

    step = int(jax.device_get(state.step))
    step0 = step  # nonzero when resumed; rate/schedule math uses deltas
    summary = {}
    t_start = time.time()
    win_step, win_t = step, t_start
    done = False
    for _ in range(epochs):
        if done or step >= total_steps:
            break
        # loss schedule: 'add' only during epoch 0, then add/add_s —
        # derived from the GLOBAL step so a resumed run does not fall
        # back to the epoch-0 ADD-only loss (reference train.py:204-219)
        use_symmetric = np.bool_(
            "add_s" in loss and step >= steps_per_epoch
        )
        for sb in _prefetch_to_device(train_loader, to_device):
            state, metrics = train_step(state, sb, use_symmetric, rng)
            step += 1

            if is_primary and step % log_interval == 0:
                m = {
                    f"main/{k}": float(v)
                    for k, v in jax.device_get(metrics).items()
                }
                if not np.isfinite(m.get("main/loss", 0.0)):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {m}"
                    )  # FailOnNonNumber equivalent (train.py:382)
                now = time.time()
                m["main/sps"] = (step - step0) / (now - t_start)
                # windowed rate excludes first-compile and eval pauses:
                # the sustained input-pipeline + device throughput
                m["main/sps_window"] = (step - win_step) / max(
                    now - win_t, 1e-9
                )
                win_step, win_t = step, now
                log.report(m, step=step, epoch=step / steps_per_epoch)

            if step % eval_every == 0:
                summary = run_eval(state.params)
                if is_primary and summary:
                    log.report(
                        {
                            k: v
                            for k, v in summary.items()
                            if k.count("/") <= 2
                        },
                        step=step,
                        epoch=step / steps_per_epoch,
                    )
                    ckpt.save_latest(state, step)
                    ckpt.save_best(
                        state.params,
                        "validation/main/add_or_add_s",
                        summary.get("main/add_or_add_s", np.inf),
                        mode="min",
                    )
                    ckpt.save_best(
                        state.params,
                        "validation/main/auc",
                        summary.get("main/add_or_add_s/auc", 0.0),
                        mode="max",
                    )
                win_step, win_t = step, time.time()
                # leak-budget restart point: latest was just saved, so
                # exiting here loses no optimizer state (single-process
                # only: RSS is host-local and a divergent exit would
                # deadlock multi-host collectives)
                if (
                    rss_exit_gb
                    and jax.process_count() == 1
                    and step < total_steps
                    and _rss_gb() > rss_exit_gb
                ):
                    raise LeakBudgetExit(
                        f"RSS {_rss_gb():.1f} GB > {rss_exit_gb} GB "
                        f"at step {step}; checkpoint saved, relaunch "
                        f"with --resume"
                    )

            if step >= total_steps:
                done = True
                break

    if is_primary and ckpt is not None:
        ckpt.save_latest(state, step)
    return state, summary
