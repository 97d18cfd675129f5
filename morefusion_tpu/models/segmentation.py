"""Instance segmentation for the runtime pipeline.

The reference uses a COCO-pretrained chainercv Mask R-CNN
(``examples/ycb_video/instance_segm/train_multi.py``) whose deployed node
keeps at most one instance per class (``nodes/
mask_rcnn_instance_segmentation.py:17-129``). The TPU-native equivalent is
a compact UNet predicting per-pixel class logits; instances are recovered
as the largest connected component per predicted class (cv2, host-side) —
the same one-instance-per-class contract the ROS node enforces, with a
single fused XLA forward instead of a two-stage detector.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet import normalize_rgb


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.features))(x))
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(nn.GroupNorm(num_groups=min(8, self.features))(x))


class UNetSegmentation(nn.Module):
    """RGB(+depth) -> per-pixel class logits (n_class incl. background)."""

    n_class: int = 22
    widths: Sequence[int] = (32, 64, 128, 256)
    use_depth: bool = False

    @nn.compact
    def __call__(self, rgb, depth=None):
        x = normalize_rgb(rgb)
        if self.use_depth and depth is not None:
            d = jnp.nan_to_num(depth)[..., None]
            x = jnp.concatenate([x, d], axis=-1)

        skips = []
        for w in self.widths[:-1]:
            x = ConvBlock(w)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.widths[-1])(x)

        for w, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(w)(x)

        return nn.Conv(self.n_class, (1, 1))(x)


def segmentation_loss(logits, labels, ignore_label: int = -1):
    """Per-pixel softmax cross-entropy; pixels with ignore_label skipped.

    labels: (B, H, W) int32 class ids (0 = background).
    """
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    ll = jnp.where(valid, ll, 0.0)
    return -jnp.sum(ll) / jnp.maximum(jnp.sum(valid), 1)


def instances_from_class_map(
    class_map: np.ndarray,
    scores: np.ndarray = None,
    min_area: int = 50,
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Class map -> (instance_label (H, W), {instance_id: class_id}).

    Largest connected component per class (the ROS node's
    one-instance-per-class contract); smaller blobs are suppressed.
    """
    import cv2

    H, W = class_map.shape
    instance_label = np.full((H, W), -1, np.int32)
    instance_to_class: Dict[int, int] = {}
    next_id = 0
    for cid in np.unique(class_map):
        if cid <= 0:
            continue
        mask = (class_map == cid).astype(np.uint8)
        n, comp = cv2.connectedComponents(mask)
        best, best_area = None, min_area
        for k in range(1, n):
            area = int((comp == k).sum())
            if area >= best_area:
                best, best_area = k, area
        if best is None:
            continue
        instance_label[comp == best] = next_id
        instance_to_class[next_id] = int(cid)
        next_id += 1
    return instance_label, instance_to_class


class SegmentationNode:
    """Runtime segmenter: jit forward + host instancing.

    Plugs into ``ScenePipeline(segmenter=...)``.
    """

    def __init__(self, model: UNetSegmentation, params):
        self._model = model
        self._params = params
        self._predict = jax.jit(
            lambda p, rgb: jnp.argmax(model.apply(p, rgb), axis=-1)
        )

    def __call__(self, rgb: np.ndarray, depth=None):
        class_map = np.asarray(
            self._predict(self._params, rgb.astype(np.float32)[None])
        )[0]
        return instances_from_class_map(class_map)
