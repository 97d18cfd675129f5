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
