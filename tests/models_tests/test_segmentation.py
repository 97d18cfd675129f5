"""Segmentation model: shapes, loss descent on one frame, instancing."""

import jax
import numpy as np
import optax
import pytest

from morefusion_tpu.datasets.instance_segmentation import (
    SyntheticInstanceSegmentationDataset,
    frame_to_class_label,
    frame_to_masks,
)
from morefusion_tpu.models.segmentation import (
    SegmentationNode,
    UNetSegmentation,
    instances_from_class_map,
    segmentation_loss,
)


def test_unet_shapes(rng):
    model = UNetSegmentation(n_class=5, widths=(8, 16, 32))
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 64, 64, 5)


def test_segmentation_loss_and_overfit(rng):
    ds = SyntheticInstanceSegmentationDataset(
        n_frames=1, image_shape=(64, 96), n_objects=(2, 2)
    )
    ex = ds[0]
    rgb = ex["rgb"][None]
    label = ex["class_label"][None]
    assert label.max() > 0  # objects present

    model = UNetSegmentation(n_class=22, widths=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0), rgb)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return segmentation_loss(model.apply(p, rgb), label)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7  # overfits a single frame


def test_segmentation_loss_fg_weight():
    # 1 fg pixel badly predicted among 15 perfect bg pixels: up-weighting
    # foreground must raise the mean loss; fg_weight=1 is the plain mean.
    logits = np.zeros((1, 4, 4, 3), np.float32)
    logits[..., 0] = 5.0  # confident background everywhere
    labels = np.zeros((1, 4, 4), np.int32)
    labels[0, 1, 1] = 2  # one foreground pixel, mispredicted
    plain = float(segmentation_loss(logits, labels))
    weighted = float(
        segmentation_loss(
            logits, labels, fg_weight=10.0
        )
    )
    assert weighted > plain * 3  # fg term dominates once up-weighted
    same = float(
        segmentation_loss(
            logits, labels, fg_weight=1.0
        )
    )
    assert np.isclose(same, plain)
    # ignore_label pixels carry zero weight regardless of fg_weight
    labels[0, 2, 2] = -1
    ig = float(
        segmentation_loss(
            logits, labels, fg_weight=10.0
        )
    )
    assert np.isfinite(ig)


def test_instances_from_class_map():
    cm = np.zeros((64, 64), np.int32)
    cm[5:25, 5:25] = 3
    cm[40:60, 40:60] = 7
    cm[0:3, 60:64] = 7  # small blob of same class -> suppressed
    label, mapping = instances_from_class_map(cm, min_area=50)
    assert sorted(mapping.values()) == [3, 7]
    assert (label[10, 10] >= 0) and mapping[label[10, 10]] == 3
    assert (label[50, 50] >= 0) and mapping[label[50, 50]] == 7
    assert label[1, 62] == -1  # suppressed blob


def test_frame_formats():
    ds = SyntheticInstanceSegmentationDataset(
        n_frames=1, image_shape=(60, 80), n_objects=(2, 2), format="masks"
    )
    rgb, bboxes, labels, masks = ds[0]
    assert rgb.shape == (60, 80, 3)
    assert len(bboxes) == len(labels) == len(masks)
    assert masks.dtype == bool


def test_segmentation_node_roundtrip(rng):
    """Untrained net produces *some* valid instancing output structure."""
    model = UNetSegmentation(n_class=22, widths=(8, 16, 32))
    rgb = rng.rand(64, 64, 3).astype(np.float32) * 255
    params = model.init(jax.random.PRNGKey(0), rgb[None])
    node = SegmentationNode(model, params)
    label, mapping = node(rgb)
    assert label.shape == (64, 64)
    for ins_id, cls in mapping.items():
        assert (label == ins_id).any()
        assert 1 <= cls <= 21
