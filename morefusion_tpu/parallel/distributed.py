"""Multi-host initialization + host-object collectives.

The reference's ChainerMN roles (SURVEY.md §2.2) and their equivalents:
  create_communicator -> jax.distributed.initialize (here)
  scatter_dataset     -> per-process batch shard (parallel.local_batch_slice)
  allreduce grads     -> lax.pmean in the shard_map train step
  bcast_obj / gather_obj -> broadcast_obj / gather_obj below
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env/args are present.

    No-op (returns False) for single-process runs, so the same train
    script works on one chip and on a pod slice.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return False
    try:
        # CPU backends need gloo for cross-process collectives (the
        # multi-process CI test runs 2 procs x 4 virtual CPU devices);
        # no-op for TPU backends. Must be set before backend init.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """Rank-0-only I/O gate (reference train.py:238-252)."""
    return jax.process_index() == 0


def barrier(name: str = "mftpu_barrier", timeout_ms: int = 1_200_000) -> None:
    """Block until every process reaches this point (ChainerMN
    ``comm``-barrier role).

    Pure coordination-service RPC — no device collective — so it is
    safe to use *around* compilation: Gloo's CPU-collective context
    rendezvous at first execution has a hard 30 s window, while two
    concurrent XLA compiles on a contended host can skew by minutes.
    Compile first, barrier, then execute together.

    ``name`` must be unique per rendezvous point within a process
    lifetime.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized outside jax.distributed (no client)
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def _obj_to_array(obj: Any, size: int) -> np.ndarray:
    data = pickle.dumps(obj)
    if len(data) > size - 8:
        raise ValueError(f"object too large: {len(data)} > {size - 8}")
    buf = np.zeros(size, np.uint8)
    buf[:8] = np.frombuffer(
        np.int64(len(data)).tobytes(), dtype=np.uint8
    )
    buf[8 : 8 + len(data)] = np.frombuffer(data, dtype=np.uint8)
    return buf


def _array_to_obj(buf: np.ndarray) -> Any:
    n = int(np.frombuffer(buf[:8].tobytes(), dtype=np.int64)[0])
    return pickle.loads(buf[8 : 8 + n].tobytes())


def broadcast_obj(obj: Any, size: int = 1 << 20) -> Any:
    """Broadcast a picklable object from process 0 (comm.bcast_obj role)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    buf = _obj_to_array(obj if is_primary() else None, size)
    out = multihost_utils.broadcast_one_to_all(buf)
    return _array_to_obj(np.asarray(out))


def gather_obj(obj: Any, size: int = 1 << 20) -> Optional[List[Any]]:
    """Gather picklable objects to process 0 (comm.gather_obj role —
    the distributed-evaluation record collection, ``pose_estimation_
    evaluator.py:80-87``). Returns the list on rank 0, None elsewhere."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    buf = _obj_to_array(obj, size)
    all_bufs = multihost_utils.process_allgather(buf)
    if not is_primary():
        return None
    return [_array_to_obj(np.asarray(b)) for b in all_bufs]
