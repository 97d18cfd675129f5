"""Experiment logging & provenance: log.json / args.json / tensorboard.

Equivalents of the reference's training extensions:
- ``LogReport`` streaming to ``log.json`` + tensorboardX
  (``training/extensions/log_tensorboard_report.py:15-104``),
- ``ArgsReport`` -> ``args.json`` with githash/hostname/timestamp
  (``args_report.py:7-27``, ``train.py:239-242``).
"""

from __future__ import annotations

import datetime
import json
import os
import socket
import tempfile

import numpy as np
from typing import Dict, Optional

from ..utils.provenance import githash


def write_args(out_dir: str, args: Dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    payload = dict(args)
    payload.setdefault("githash", githash())
    payload.setdefault("hostname", socket.gethostname())
    payload.setdefault(
        "timestamp", datetime.datetime.now().isoformat()
    )
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


def load_args(out_dir: str) -> Dict:
    """Eval-time model reconstruction reads args.json back
    (reference ``evaluate.py:32-44``)."""
    with open(os.path.join(out_dir, "args.json")) as f:
        return json.load(f)


class LogReport:
    """Append observation rows; write log.json atomically; optional TB."""

    def __init__(
        self, out_dir: str, use_tensorboard: bool = False, resume: bool = True
    ):
        self._out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._log = []
        log_path = os.path.join(out_dir, "log.json")
        if resume and os.path.exists(log_path):
            # keep history across resumes (reference
            # LogTensorboardReport.serialize, :85-100)
            try:
                with open(log_path) as f:
                    self._log = json.load(f)
            except (json.JSONDecodeError, OSError):
                pass
        self._writer = None
        if use_tensorboard:
            try:
                import tensorboardX

                self._writer = tensorboardX.SummaryWriter(
                    logdir=os.path.join(out_dir, "tb")
                )
            except Exception:
                self._writer = None

    @property
    def log(self):
        return list(self._log)

    def report(
        self, observation: Dict[str, float], step: int, epoch: Optional[float] = None
    ) -> None:
        row = {k: float(v) for k, v in observation.items()}
        row["iteration"] = int(step)
        if epoch is not None:
            row["epoch"] = float(epoch)
        row["elapsed_time"] = datetime.datetime.now().timestamp()
        self._log.append(row)

        if self._writer is not None:
            for k, v in observation.items():
                self._writer.add_scalar(k, float(v), int(step))

        # atomic write (reference behavior)
        fd, tmp = tempfile.mkstemp(dir=self._out_dir, suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump(self._log, f, indent=1)
        os.replace(tmp, os.path.join(self._out_dir, "log.json"))

    def report_histograms(self, params, step: int, prefix: str = "params"):
        """Parameter histograms to tensorboard (the reference's
        ``ParameterTensorboardReport``); no-op without a writer."""
        if self._writer is None:
            return
        import jax

        flat = jax.tree_util.tree_leaves_with_path(params)
        for path, leaf in flat:
            name = prefix + "/".join(str(p) for p in path)
            try:
                self._writer.add_histogram(
                    name, np.asarray(leaf).ravel(), int(step)
                )
            except Exception:
                pass

    def state_dict(self):
        return {"log": self._log}

    def load_state_dict(self, state):
        self._log = list(state.get("log", []))
