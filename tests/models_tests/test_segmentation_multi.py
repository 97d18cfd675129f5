"""Multi-instance segmentation: boundary head, instancing, matching.

Covers the capability the reference gets from Mask R-CNN (multiple
instances of one class, ``train_multi.py:53-170``) that the plain
per-class connected-component instancing lacked.
"""

import jax
import numpy as np

from morefusion_tpu.models.segmentation import (
    UNetSegmentation,
    boundary_from_instance_label,
    boundary_loss,
    instances_from_predictions,
    match_instances,
    miou,
)


def test_unet_boundary_head_shapes(rng):
    model = UNetSegmentation(n_class=5, widths=(8, 16, 32), with_boundary=True)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits, blog = model.apply(params, x)
    assert logits.shape == (1, 64, 64, 5)
    assert blog.shape == (1, 64, 64)


def test_boundary_from_instance_label():
    lab = np.full((32, 32), -1, np.int32)
    lab[4:16, 4:28] = 0
    lab[16:28, 4:28] = 1  # touches instance 0 along row 16
    b = boundary_from_instance_label(lab, width=1)
    assert b[16, 10] and b[15, 10]  # contact line is boundary
    assert not b[4, 10]  # silhouette vs background is not
    assert not b[31, 31]


def test_boundary_loss_decreases_with_correct_logits():
    y = np.zeros((1, 16, 16), bool)
    y[0, 8] = True
    good = np.where(y, 5.0, -5.0).astype(np.float32)
    bad = -good
    assert float(boundary_loss(good, y)) < float(boundary_loss(bad, y))


def test_instances_split_touching_same_class():
    """Two touching same-class blobs split along the boundary line."""
    cm = np.zeros((64, 64), np.int32)
    cm[8:56, 8:30] = 3
    cm[8:56, 30:52] = 3  # one contiguous class mask
    boundary = np.zeros((64, 64), bool)
    boundary[8:56, 29:32] = True  # predicted contact line

    lab, cls = instances_from_predictions(cm, boundary, min_area=50)
    assert len(cls) == 2
    assert all(c == 3 for c in cls.values())
    # boundary pixels reassigned: full class mask covered
    assert ((lab >= 0) == (cm == 3)).all()
    # the two instances fall on either side of the line
    assert lab[30, 15] != lab[30, 45]


def test_instances_multi_component_without_boundary():
    cm = np.zeros((64, 64), np.int32)
    cm[5:20, 5:20] = 7
    cm[40:60, 40:60] = 7  # disjoint same-class blobs
    lab, cls = instances_from_predictions(cm, None, min_area=20)
    assert len(cls) == 2


def test_match_instances_and_miou():
    gt = np.full((32, 32), -1, np.int32)
    gt[2:12, 2:12] = 0
    gt[20:30, 20:30] = 1
    gt_cls = {0: 5, 1: 5}
    pred = np.full((32, 32), -1, np.int32)
    pred[3:13, 2:12] = 0  # overlaps gt 0 with IoU ~0.8
    pred[20:30, 20:30] = 1
    pred_cls = {0: 5, 1: 5}
    m, g, p = match_instances(pred, pred_cls, gt, gt_cls)
    assert (m, g, p) == (2, 2, 2)

    # wrong class -> no match
    m2, _, _ = match_instances(pred, {0: 4, 1: 4}, gt, gt_cls)
    assert m2 == 0

    cm_pred = np.where(pred >= 0, 5, 0)
    cm_gt = np.where(gt >= 0, 5, 0)
    assert 0.7 < miou(cm_pred, cm_gt) <= 1.0


def _label_from(class_map, blobs):
    """blobs: list of (mask, class_id) -> (instance_label, {id: cid})."""
    label = np.full(class_map.shape, -1, np.int32)
    classes = {}
    for k, (mask, cid) in enumerate(blobs):
        label[mask] = k
        classes[k] = cid
    return label, classes


def test_merge_occlusion_split_fragments():
    """One object cut in two by an occluder of another class merges."""
    from morefusion_tpu.models.segmentation import merge_occlusion_splits

    H, W = 60, 80
    cm = np.zeros((H, W), np.int32)
    a = np.zeros((H, W), bool); a[20:40, 10:30] = True       # left half
    occ = np.zeros((H, W), bool); occ[15:45, 30:36] = True   # occluder
    b = np.zeros((H, W), bool); b[20:40, 36:56] = True       # right half
    cm[a] = 3; cm[b] = 3; cm[occ] = 7
    label, classes = _label_from(
        cm, [(a, 3), (b, 3), (occ, 7)]
    )
    out, out_cls = merge_occlusion_splits(label, classes, cm)
    ids3 = [i for i, c in out_cls.items() if c == 3]
    assert len(ids3) == 1, out_cls
    merged = out == ids3[0]
    assert (merged == (a | b)).all()
    assert len([i for i, c in out_cls.items() if c == 7]) == 1


def test_adjacent_same_class_instances_stay_split():
    """Two touching same-class objects (deliberate boundary split,
    zero-width seam after carve+flood) must NOT merge — even when both
    rest against a third object."""
    from morefusion_tpu.models.segmentation import merge_occlusion_splits

    H, W = 60, 80
    cm = np.zeros((H, W), np.int32)
    a = np.zeros((H, W), bool); a[20:40, 10:30] = True
    b = np.zeros((H, W), bool); b[20:40, 30:50] = True  # touches a
    base = np.zeros((H, W), bool); base[40:55, 5:55] = True  # under both
    cm[a] = 3; cm[b] = 3; cm[base] = 9
    label, classes = _label_from(cm, [(a, 3), (b, 3), (base, 9)])
    out, out_cls = merge_occlusion_splits(label, classes, cm)
    assert len([i for i, c in out_cls.items() if c == 3]) == 2


def test_background_separated_instances_stay_split():
    from morefusion_tpu.models.segmentation import merge_occlusion_splits

    H, W = 60, 80
    cm = np.zeros((H, W), np.int32)
    a = np.zeros((H, W), bool); a[20:40, 5:25] = True
    b = np.zeros((H, W), bool); b[20:40, 35:55] = True  # 10px bg gap
    cm[a] = 3; cm[b] = 3
    label, classes = _label_from(cm, [(a, 3), (b, 3)])
    out, out_cls = merge_occlusion_splits(label, classes, cm)
    assert len(out_cls) == 2


def test_splinter_absorbed_into_main_blob():
    """A fragment far below min_frac of its neighbor merges whatever
    separates them (relative minimum-component-size rule)."""
    from morefusion_tpu.models.segmentation import merge_occlusion_splits

    H, W = 60, 80
    cm = np.zeros((H, W), np.int32)
    a = np.zeros((H, W), bool); a[10:50, 10:50] = True   # 1600 px
    s = np.zeros((H, W), bool); s[25:31, 52:58] = True   # 36 px, 2px gap
    cm[a] = 5; cm[s] = 5
    label, classes = _label_from(cm, [(a, 5), (s, 5)])
    out, out_cls = merge_occlusion_splits(label, classes, cm)
    assert len(out_cls) == 1
    assert (out[s] == list(out_cls)[0]).all()


def test_merge_is_transitive_and_ids_compact():
    """Three fragments of one object behind two occluder strips."""
    from morefusion_tpu.models.segmentation import merge_occlusion_splits

    H, W = 60, 100
    cm = np.zeros((H, W), np.int32)
    f1 = np.zeros((H, W), bool); f1[20:40, 5:25] = True
    o1 = np.zeros((H, W), bool); o1[10:50, 25:31] = True
    f2 = np.zeros((H, W), bool); f2[20:40, 31:51] = True
    o2 = np.zeros((H, W), bool); o2[10:50, 51:57] = True
    f3 = np.zeros((H, W), bool); f3[20:40, 57:77] = True
    for m, c in ((f1, 4), (f2, 4), (f3, 4), (o1, 8), (o2, 11)):
        cm[m] = c
    label, classes = _label_from(
        cm, [(f1, 4), (o1, 8), (f2, 4), (o2, 11), (f3, 4)]
    )
    out, out_cls = merge_occlusion_splits(label, classes, cm)
    ids4 = [i for i, c in out_cls.items() if c == 4]
    assert len(ids4) == 1
    assert sorted(out_cls) == list(range(len(out_cls)))
    assert (out[f1 | f2 | f3] == ids4[0]).all()
