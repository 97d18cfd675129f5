"""Device-mesh helpers: 1-D data parallelism over ICI/DCN.

The reference's only parallelism strategy is multi-process data parallelism
via ChainerMN pure_nccl (SURVEY.md §2.2 — no tensor/pipeline/sequence/
expert parallelism exists in MoreFusion). The TPU-native equivalent is a
1-D ``Mesh('data')`` with batch sharding: XLA inserts the gradient
all-reduce over ICI automatically; multi-host runs shard the global batch
per process and keep rank-0-only I/O (``jax.process_index() == 0``).

The model axes that could shard further (1000 points, 32^3 voxels, N
objects in joint refinement) fit comfortably on one chip; batch sharding is
the profitable axis, matching the reference design.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """This process's slice of the global batch (multi-host data loading).

    Mirrors the reference's ``chainermn.scatter_dataset`` role: each host
    feeds only its shard (``train.py:312-318``).
    """
    n = jax.process_count()
    r = jax.process_index()
    per = global_batch_size // n
    return slice(r * per, (r + 1) * per)
