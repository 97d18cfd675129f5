"""Checkpoint / resume via orbax.

Equivalent of the reference's Chainer npz snapshots
(``train.py:434-461``): a rolling latest checkpoint holding full trainer
state (params + optimizer + step) plus model-only best-by-metric snapshots
(best validation ADD, best AUC), and ``--resume`` restoring everything.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, out_dir: str, max_to_keep: int = 2):
        self._dir = os.path.abspath(out_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._best: Dict[str, float] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self._dir, name)

    def save_latest(self, state: Any, step: int) -> None:
        path = self._path("snapshot_trainer_latest")
        self._ckpt.save(path, jax.device_get(state), force=True)
        # StandardCheckpointer saves asynchronously; make saves durable
        # before returning (the reference's snapshots are synchronous).
        self._ckpt.wait_until_finished()

    def save_best(
        self, params: Any, metric_name: str, value: float, mode: str = "max"
    ) -> bool:
        """Save model-only snapshot when the metric improves."""
        best = self._best.get(metric_name)
        improved = (
            best is None
            or (mode == "max" and value > best)
            or (mode == "min" and value < best)
        )
        if improved:
            self._best[metric_name] = value
            safe = metric_name.replace("/", "_")
            self._ckpt.save(
                self._path(f"snapshot_model_best_{safe}"),
                jax.device_get(params),
                force=True,
            )
            self._ckpt.wait_until_finished()
        return improved

    def restore_latest(self, target: Any) -> Optional[Any]:
        path = self._path("snapshot_trainer_latest")
        if not os.path.isdir(path):
            return None
        return self._ckpt.restore(path, target=jax.device_get(target))

    def restore_best(self, target: Any, metric_name: str) -> Optional[Any]:
        safe = metric_name.replace("/", "_")
        path = self._path(f"snapshot_model_best_{safe}")
        if not os.path.isdir(path):
            return None
        return self._ckpt.restore(path, target=jax.device_get(target))
