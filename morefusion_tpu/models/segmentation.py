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
    """RGB(+depth) -> per-pixel class logits (n_class incl. background).

    With ``with_boundary=True`` the decoder adds an instance-boundary
    head (1-channel logit of "this pixel separates two instances") and
    returns ``(class_logits, boundary_logits)`` — the semantic+boundary
    instancing scheme that recovers *multiple instances per class*
    (touching same-class objects are split along predicted boundaries),
    closing the capability gap vs the reference's Mask R-CNN
    (``examples/ycb_video/instance_segm/train_multi.py:53-170``).
    """

    n_class: int = 22
    widths: Sequence[int] = (32, 64, 128, 256)
    use_depth: bool = False
    with_boundary: bool = False

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

        class_logits = nn.Conv(self.n_class, (1, 1))(x)
        if not self.with_boundary:
            return class_logits
        boundary_logits = nn.Conv(1, (1, 1))(x)[..., 0]
        return class_logits, boundary_logits


def segmentation_loss(
    logits, labels, ignore_label: int = -1, fg_weight: float = 1.0
):
    """Per-pixel softmax cross-entropy; pixels with ignore_label skipped.

    labels: (B, H, W) int32 class ids (0 = background).

    ``fg_weight`` > 1 up-weights foreground pixels: background dominates
    the pixel count ~10:1, so heavily occluded objects (a few hundred
    visible px) contribute almost nothing to the plain mean — the
    round-5 measured recall ceiling (detection 0.81 while precision
    levers saturate, docs/results/r5_seg_per_class*.json).
    """
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = jnp.where(valid, jnp.where(safe > 0, fg_weight, 1.0), 0.0)
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1e-6)


def boundary_loss(logits, boundary_true, pos_weight: float = 5.0):
    """Weighted sigmoid BCE on the instance-boundary head.

    boundary_true: (B, H, W) bool/0-1. Boundary pixels are rare (~2% of a
    frame), so positives are up-weighted.
    """
    y = boundary_true.astype(logits.dtype)
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    ll = pos_weight * y * logp + (1.0 - y) * lognp
    denom = jnp.maximum(pos_weight * jnp.sum(y) + jnp.sum(1.0 - y), 1.0)
    return -jnp.sum(ll) / denom


def boundary_from_instance_label(
    instance_label: np.ndarray, width: int = 2
) -> np.ndarray:
    """GT boundaries: pixels whose neighborhood spans 2+ instances.

    Computed from the instance-label image (background < 0 excluded, so
    object silhouettes against background are NOT boundaries — only
    instance-instance contact lines, which is what separates touching
    same-class objects).
    """
    import cv2

    lab = instance_label.astype(np.int32)
    fg = lab >= 0
    big = np.where(fg, lab, -1).astype(np.float32)
    k = np.ones((2 * width + 1,) * 2, np.uint8)
    # max/min of the instance id over the neighborhood, restricted to fg
    mx = cv2.dilate(np.where(fg, big, -np.inf).astype(np.float32), k)
    mn = -cv2.dilate(np.where(fg, -big, -np.inf).astype(np.float32), k)
    touch = np.isfinite(mx) & np.isfinite(mn) & (mx != mn)
    return touch & fg


def instances_from_predictions(
    class_map: np.ndarray,
    boundary: np.ndarray = None,
    min_area: int = 50,
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Class map (+ predicted boundaries) -> multi-instance labels.

    Per class: connected components of (mask minus boundary pixels), each
    surviving component (>= min_area) becomes an instance; boundary-carved
    pixels are reassigned to the nearest surviving component
    (distance-transform labels). Without a boundary map this degrades to
    multi-component instancing (separated same-class objects still split).
    """
    import cv2

    H, W = class_map.shape
    instance_label = np.full((H, W), -1, np.int32)
    instance_to_class: Dict[int, int] = {}
    next_id = 0
    bnd = (
        np.zeros((H, W), bool)
        if boundary is None
        else boundary.astype(bool)
    )
    for cid in np.unique(class_map):
        if cid <= 0:
            continue
        mask = class_map == cid
        core = (mask & ~bnd).astype(np.uint8)
        n, comp = cv2.connectedComponents(core)
        keep = []
        for k in range(1, n):
            if int((comp == k).sum()) >= min_area:
                keep.append(k)
        if not keep:
            continue
        # reassign carved/boundary pixels of this class to the nearest
        # surviving core pixel's component
        core_keep = np.isin(comp, keep)
        if (mask & ~core_keep).any():
            dist, nearest = cv2.distanceTransformWithLabels(
                (~core_keep).astype(np.uint8),
                cv2.DIST_L2,
                3,
                labelType=cv2.DIST_LABEL_PIXEL,
            )
            ys, xs = np.nonzero(core_keep)
            lut = np.zeros(int(nearest.max()) + 1, np.int32)
            lut[nearest[ys, xs]] = comp[ys, xs]
            comp = np.where(core_keep, comp, lut[nearest])
        for k in keep:
            sel = mask & (comp == k)
            instance_label[sel] = next_id
            instance_to_class[next_id] = int(cid)
            next_id += 1
    return instance_label, instance_to_class


def merge_occlusion_splits(
    instance_label: np.ndarray,
    instance_to_class: Dict[int, int],
    class_map: np.ndarray,
    gap: int = 8,
    min_frac: float = 0.25,
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Merge same-class instance fragments that an occluder split apart.

    Round-4 measured failure (docs/results/r4_seg_per_class.json): the
    boundary head over-splits heavily occluded instances — one object
    whose visible mask is cut in two by an occluder becomes two
    predicted instances (precision 0.769 -> 0.691, foam_brick detection
    0.53). The reference's Mask R-CNN predicts whole-instance masks and
    is immune (`examples/ycb_video/instance_segm/train_multi.py`); a
    dense class+boundary head needs this post-pass.

    Decision per same-class instance pair:

    - a splinter (< ``min_frac`` the area of the other) within ``gap``
      px of it is carve debris: merge regardless of what separates
      them (the relative minimum-component-size rule);
    - comparable-size instances that are directly ADJACENT were split
      on purpose by the boundary head (carved pixels are flooded back
      onto the cores, so a deliberate split leaves a zero-width seam):
      keep the split — scenes sample classes with replacement, touching
      duplicates occur (``simulation/scene_generation.py:325``);
    - comparable-size, non-adjacent instances whose ``gap``-dilations
      overlap merge iff the separating band (overlap minus both masks)
      is dominated by OTHER-class foreground — an occluder cut one
      object in two. A background-dominated band means genuinely
      separate objects.

    Transitive merges resolve by union-find; output ids are compacted.
    """
    fragments: Dict[int, list] = {}
    for iid, cid in instance_to_class.items():
        fragments.setdefault(cid, []).append(iid)

    parent = {iid: iid for iid in instance_to_class}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    import cv2

    kernel = np.ones((2 * gap + 1,) * 2, np.uint8)
    for cid, ids in fragments.items():
        if len(ids) < 2:
            continue
        masks = {i: instance_label == i for i in ids}
        areas = {i: int(masks[i].sum()) for i in ids}
        dil = {
            i: cv2.dilate(masks[i].astype(np.uint8), kernel).astype(bool)
            for i in ids
        }
        k3 = np.ones((3, 3), np.uint8)
        for a_i, i in enumerate(ids):
            for j in ids[a_i + 1:]:
                band = dil[i] & dil[j] & ~masks[i] & ~masks[j]
                adjacent = bool(
                    (
                        cv2.dilate(
                            masks[i].astype(np.uint8), k3
                        ).astype(bool)
                        & masks[j]
                    ).any()
                )
                small, big = sorted((areas[i], areas[j]))
                if small < min_frac * big:
                    if adjacent or band.any():
                        union(i, j)
                    continue
                if adjacent or not band.any():
                    continue
                cm = class_map[band]
                n_occ = int(((cm > 0) & (cm != cid)).sum())
                n_bg = int((cm == 0).sum())
                if n_occ > n_bg:
                    union(i, j)

    roots = sorted({find(i) for i in instance_to_class})
    remap = {}
    for new_id, root in enumerate(roots):
        remap[root] = new_id
    lut = {i: remap[find(i)] for i in instance_to_class}
    out_label = np.full_like(instance_label, -1)
    for iid, nid in lut.items():
        out_label[instance_label == iid] = nid
    out_classes = {
        remap[root]: instance_to_class[root] for root in roots
    }
    return out_label, out_classes


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


def miou(class_map_pred: np.ndarray, class_map_true: np.ndarray,
         n_class: int = 22) -> float:
    """Mean IoU over classes present in either map (incl. background)."""
    ious = []
    for c in range(n_class):
        p = class_map_pred == c
        t = class_map_true == c
        union = (p | t).sum()
        if union == 0:
            continue
        ious.append((p & t).sum() / union)
    return float(np.mean(ious)) if ious else 0.0


def match_instances(
    pred_label: np.ndarray,
    pred_classes: Dict[int, int],
    gt_label: np.ndarray,
    gt_classes: Dict[int, int],
    iou_threshold: float = 0.5,
) -> Tuple[int, int, int]:
    """Greedy IoU matching of predicted to GT instances (same class only).

    Returns (n_matched, n_gt, n_pred) — detection rate = matched / gt.
    """
    used = set()
    n_matched = 0
    for gid, gcls in gt_classes.items():
        gmask = gt_label == gid
        if not gmask.any():
            continue
        best, best_iou = None, iou_threshold
        for pid, pcls in pred_classes.items():
            if pid in used or pcls != gcls:
                continue
            pmask = pred_label == pid
            inter = (gmask & pmask).sum()
            if inter == 0:
                continue
            iou = inter / (gmask | pmask).sum()
            if iou >= best_iou:
                best, best_iou = pid, iou
        if best is not None:
            used.add(best)
            n_matched += 1
    n_gt = sum(1 for g in gt_classes if (gt_label == g).any())
    return n_matched, n_gt, len(pred_classes)


class SegmentationNode:
    """Runtime segmenter: one fused jit from pixels to instance keys.

    Plugs into ``ScenePipeline(segmenter=...)``. With a boundary-head
    model, recovers multiple instances per class.

    ``device_instancing=True`` (default) runs argmax + boundary +
    connected components inside the same jit program
    (``ops/connected_components.py`` min-label propagation) — one device
    call, one ``(H, W)`` int32 readback, ~0.5 ms of host relabeling.
    The round-2 host path (cv2 per-class components + distance
    transform) cost ~90 ms/frame on the 1-core host and remains
    available as the ``device_instancing=False`` oracle.
    """

    def __init__(
        self,
        model: UNetSegmentation,
        params,
        min_area: int = 50,
        device_instancing: bool = True,
        merge_splits: bool = True,
    ):
        self._model = model
        self._params = params
        self._min_area = min_area
        self._device_instancing = device_instancing
        self._merge_splits = merge_splits

        def forward(p, rgb, depth):
            kwargs = {}
            if model.use_depth:
                kwargs["depth"] = depth
            out = model.apply(p, rgb, **kwargs)
            if model.with_boundary:
                logits, blog = out
                return jnp.argmax(logits, axis=-1), blog > 0.0
            return jnp.argmax(out, axis=-1), None

        if device_instancing:
            from ..ops.connected_components import connected_components

            def predict(p, rgb, depth):
                class_map, bnd = forward(p, rgb, depth)
                comp = connected_components(
                    class_map[0],
                    None if bnd is None else bnd[0],
                )
                return class_map[0], comp

        else:

            def predict(p, rgb, depth):
                class_map, bnd = forward(p, rgb, depth)
                return class_map, (
                    jnp.zeros_like(class_map, jnp.bool_)
                    if bnd is None
                    else bnd
                )

        self._predict = jax.jit(predict)

    def __call__(self, rgb: np.ndarray, depth=None):
        if depth is None:
            depth = np.zeros(rgb.shape[:2], np.float32)
        args = (
            self._params,
            rgb.astype(np.float32)[None],
            np.asarray(depth, np.float32)[None],
        )
        if self._device_instancing:
            from ..ops.connected_components import relabel_components

            class_map, comp = jax.device_get(self._predict(*args))
            label, classes = relabel_components(
                comp, class_map, min_area=self._min_area
            )
            cm = np.asarray(class_map)
        else:
            class_map, bnd = jax.device_get(self._predict(*args))
            cm = np.asarray(class_map)[0]
            label, classes = instances_from_predictions(
                cm,
                (
                    None
                    if not self._model.with_boundary
                    else np.asarray(bnd)[0]
                ),
                min_area=self._min_area,
            )
        if self._merge_splits:
            label, classes = merge_occlusion_splits(label, classes, cm)
        return label, classes
