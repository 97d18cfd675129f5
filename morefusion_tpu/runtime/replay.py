"""Sequence record / replay: the rosbag tooling role, transport-free.

The reference ships rosbag helpers (``rosbag_play_rs_rgbd.py``,
``republish_tf_static_for_rosbag.py``) to capture and re-drive the live
camera stream through the node graph. Here the node graph is
``ScenePipeline`` and the transport is direct calls, so the equivalent is:

- ``SequenceRecorder`` — append sensor frames (+ camera pose, optional
  labels) to an indexed npz directory with timestamps (``rosbag record``
  of the rgb/depth/camera_info/tf topics);
- ``play_sequence`` — stream a recorded directory through a pipeline in
  order, optionally reproducing the recorded timing at a rate factor
  (``rosbag play --rate``). The static camera->map transform rides inside
  each frame (``T_cam2world``), covering the tf_static republish role.

Frame files are the ``FrameDirectoryDataset`` contract, so a recorded
sequence doubles as a dataset source for the instance-example factory.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, Optional

import numpy as np

from ..datasets.rgbd_pose_estimation.frame_directory import save_frame


class SequenceRecorder:
    def __init__(self, out_dir: str):
        self._out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._stamps = []
        self._count = 0

    def record(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        K: np.ndarray,
        T_cam2world: np.ndarray,
        instance_label: Optional[np.ndarray] = None,
        instance_ids=None,
        class_ids=None,
        Ts_cad2cam=None,
        stamp: Optional[float] = None,
    ) -> str:
        """Append one frame; returns its id."""
        frame_id = f"{self._count:08d}"
        frame = dict(
            rgb=np.asarray(rgb),
            depth=np.asarray(depth),
            intrinsic_matrix=np.asarray(K),
            T_cam2world=np.asarray(T_cam2world),
        )
        if instance_label is not None:
            frame["instance_label"] = np.asarray(instance_label)
        if instance_ids is not None:
            frame["instance_ids"] = np.asarray(instance_ids)
        if class_ids is not None:
            frame["class_ids"] = np.asarray(class_ids)
        if Ts_cad2cam is not None:
            frame["Ts_cad2cam"] = np.asarray(Ts_cad2cam)
        save_frame(os.path.join(self._out_dir, frame_id + ".npz"), frame)
        self._stamps.append(
            dict(id=frame_id, stamp=time.time() if stamp is None else stamp)
        )
        self._count += 1
        self._flush_index()
        return frame_id

    def _flush_index(self):
        with open(os.path.join(self._out_dir, "sequence.json"), "w") as f:
            json.dump({"frames": self._stamps}, f, indent=2)


def load_sequence(root_dir: str) -> Iterator[dict]:
    """Yield recorded frames (with ``stamp`` and ``id`` keys) in order."""
    index_file = os.path.join(root_dir, "sequence.json")
    if os.path.exists(index_file):
        with open(index_file) as f:
            entries = json.load(f)["frames"]
    else:  # plain frame directory without timing
        entries = [
            dict(id=f[:-4], stamp=None)
            for f in sorted(os.listdir(root_dir))
            if f.endswith(".npz")
        ]
    for e in entries:
        frame = dict(
            np.load(os.path.join(root_dir, e["id"] + ".npz"))
        )
        frame["id"] = e["id"]
        frame["stamp"] = e["stamp"]
        yield frame


def play_sequence(
    root_dir: str,
    pipeline,
    rate: float = 0.0,
    use_labels: bool = True,
) -> Dict[str, dict]:
    """Drive a pipeline with a recorded sequence.

    Args:
      pipeline: a ``ScenePipeline`` (or anything with its
        ``process_frame`` signature).
      rate: 0 = as fast as possible; otherwise reproduce recorded
        timing scaled by ``rate`` (1.0 = real time).
      use_labels: pass recorded instance labels through (GT mode); False
        forces the pipeline's segmenter.

    Returns {frame_id: pipeline results}.
    """
    results = {}
    prev_stamp = None
    prev_wall = None
    for frame in load_sequence(root_dir):
        if rate > 0 and prev_stamp is not None and frame["stamp"]:
            dt = (frame["stamp"] - prev_stamp) / rate
            sleep = dt - (time.time() - prev_wall)
            if sleep > 0:
                time.sleep(sleep)
        prev_stamp = frame.get("stamp")
        prev_wall = time.time()

        kwargs = {}
        if use_labels and "instance_label" in frame:
            kwargs["instance_label"] = frame["instance_label"]
            if "instance_ids" in frame and "class_ids" in frame:
                kwargs["instance_to_class"] = {
                    int(i): int(c)
                    for i, c in zip(
                        frame["instance_ids"], frame["class_ids"]
                    )
                }
        results[frame["id"]] = pipeline.process_frame(
            frame["rgb"],
            frame["depth"],
            frame["intrinsic_matrix"],
            frame["T_cam2world"],
            **kwargs,
        )
    return results
