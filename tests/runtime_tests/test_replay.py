"""Sequence record/replay (the rosbag tooling role)."""

import numpy as np

from morefusion_tpu.runtime import (
    SequenceRecorder,
    load_sequence,
    play_sequence,
)


def _frame(seed, H=32, W=40):
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    depth = rng.uniform(0.4, 0.8, (H, W)).astype(np.float32)
    label = np.full((H, W), -1, np.int32)
    label[8:20, 8:25] = 0
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    return rgb, depth, label, K


def test_record_and_load(tmp_path):
    rec = SequenceRecorder(str(tmp_path))
    for k in range(3):
        rgb, depth, label, K = _frame(k)
        rec.record(
            rgb, depth, K, np.eye(4),
            instance_label=label,
            instance_ids=np.array([0]),
            class_ids=np.array([2]),
            stamp=100.0 + 0.1 * k,
        )
    frames = list(load_sequence(str(tmp_path)))
    assert [f["id"] for f in frames] == ["00000000", "00000001", "00000002"]
    assert frames[1]["stamp"] == 100.1
    np.testing.assert_array_equal(frames[0]["rgb"], _frame(0)[0])


def test_play_sequence_drives_pipeline(tmp_path):
    rec = SequenceRecorder(str(tmp_path))
    for k in range(2):
        rgb, depth, label, K = _frame(k)
        rec.record(
            rgb, depth, K, np.eye(4),
            instance_label=label,
            instance_ids=np.array([0]),
            class_ids=np.array([2]),
            stamp=float(k),
        )

    calls = []

    class FakePipeline:
        def process_frame(self, rgb, depth, K, T, **kw):
            calls.append((rgb.shape, sorted(kw)))
            return {"ok": True}

    results = play_sequence(str(tmp_path), FakePipeline())
    assert len(results) == 2
    assert calls[0][0] == (32, 40, 3)
    assert "instance_label" in calls[0][1]
    assert "instance_to_class" in calls[0][1]

    # without labels the pipeline must receive none
    calls.clear()
    play_sequence(str(tmp_path), FakePipeline(), use_labels=False)
    assert calls[0][1] == []
