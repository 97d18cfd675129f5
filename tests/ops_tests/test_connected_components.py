"""Device connected components vs the cv2 host oracle."""

import numpy as np
import pytest

from morefusion_tpu.ops import connected_components, relabel_components


def _random_class_map(rng, H=64, W=80, n_class=4, n_blobs=8):
    import cv2

    cm = np.zeros((H, W), np.int32)
    for _ in range(n_blobs):
        cid = rng.randint(1, n_class + 1)
        y, x = rng.randint(0, H), rng.randint(0, W)
        r = rng.randint(3, 12)
        cv2.circle(cm, (x, y), r, int(cid), -1)
    return cm


def _partition(labels):
    """Canonical partition: map of frozenset(pixel indices) per label."""
    out = {}
    for lab in np.unique(labels):
        if lab < 0:
            continue
        out[lab] = frozenset(np.flatnonzero(labels.ravel() == lab))
    return set(out.values())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_cv2_per_class(seed):
    import cv2

    rng = np.random.RandomState(seed)
    cm = _random_class_map(rng)
    comp = np.asarray(connected_components(cm))

    # oracle: cv2 8-connected components per class
    oracle = np.full(cm.shape, -1, np.int64)
    next_id = 0
    for cid in np.unique(cm):
        if cid <= 0:
            continue
        n, lab = cv2.connectedComponents(
            (cm == cid).astype(np.uint8), connectivity=8
        )
        for k in range(1, n):
            oracle[lab == k] = next_id
            next_id += 1

    # identical partitions (labels differ, components must not)
    assert _partition(comp) == _partition(oracle)
    # background stays background
    assert ((comp == -1) == (cm == 0)).all()


def test_boundary_carving_splits_touching_instances():
    # two touching same-class squares separated by a boundary line
    cm = np.zeros((40, 60), np.int32)
    cm[10:30, 10:50] = 3
    bnd = np.zeros((40, 60), bool)
    bnd[10:30, 29:31] = True

    comp = np.asarray(connected_components(cm, bnd))
    labels, cls = relabel_components(comp, cm, min_area=10)
    assert len(cls) == 2
    assert set(cls.values()) == {3}
    # boundary pixels assigned to one of the two instances, not dropped
    assert (labels[10:30, 10:50] >= 0).all()
    # left/right cores in different instances
    assert labels[20, 15] != labels[20, 45]


def test_no_bleed_across_classes():
    # two touching different-class rectangles: must stay separate even
    # without a boundary map
    cm = np.zeros((20, 30), np.int32)
    cm[5:15, 5:15] = 1
    cm[5:15, 15:25] = 2
    comp = np.asarray(connected_components(cm))
    assert comp[10, 10] != comp[10, 20]


def test_relabel_min_area_filter():
    cm = np.zeros((32, 32), np.int32)
    cm[2:4, 2:4] = 1  # 4 px — below min_area
    cm[10:26, 10:26] = 1  # 256 px
    comp = np.asarray(connected_components(cm))
    labels, cls = relabel_components(comp, cm, min_area=50)
    assert len(cls) == 1
    assert labels[2, 2] == -1
    assert labels[12, 12] == 0
    assert cls[0] == 1


def test_snake_shape_converges():
    # worst-case geodesic: a serpentine 1-px path; path compression must
    # still reach the fixed point within max_iters
    H, W = 24, 24
    cm = np.zeros((H, W), np.int32)
    for r in range(0, H, 2):
        cm[r, :] = 1
        if (r // 2) % 2 == 0 and r + 1 < H:
            cm[r + 1, W - 1] = 1
        elif r + 1 < H:
            cm[r + 1, 0] = 1
    comp = np.asarray(connected_components(cm))
    fg = cm > 0
    assert len(np.unique(comp[fg])) == 1
