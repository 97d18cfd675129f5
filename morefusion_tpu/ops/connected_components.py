"""Connected components on device: masked min-label propagation.

The runtime segmenter (``models/segmentation.py``) recovers instances
from a predicted class map. The reference does this host-side with
OpenCV (its Mask R-CNN node emits per-instance masks directly,
``nodes/mask_rcnn_instance_segmentation.py:17-129``); our round-2
measurement put the host cv2 pass + per-class Python loop at ~90 ms per
240x320 frame on the 1-core TPU host — dominating the segmenter budget.

TPU-native design: connected components as an iterative *min-label
propagation* inside one jit —

  1. every foreground pixel starts labeled with its own linear index;
  2. each step takes the minimum label over the 8-neighborhood,
     restricted to neighbors of the same class (so components never
     bleed across classes);
  3. a pointer-jumping step ``label = label[label]`` (labels ARE linear
     indices, so they can be chased as pointers) compresses label chains,
     turning O(diameter) propagation into ~O(log diameter);
  4. a ``lax.while_loop`` runs until a fixed point.

With a boundary map (the instance-boundary head that splits touching
same-class objects), components form on ``mask & ~boundary`` first and
the carved pixels are then flooded from the frozen cores — the device
equivalent of cv2.distanceTransformWithLabels nearest-core assignment.

The result is a ``(H, W)`` int32 map of component keys (min linear index
per component, -1 in background) — ONE readback, with only a trivial
``np.unique`` relabel left on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max


def _shift(x, dy: int, dx: int, fill):
    """Shift a 2-D array by (dy, dx), filling vacated pixels."""
    H, W = x.shape
    out = jnp.full_like(x, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    yd = slice(max(-dy, 0), H + min(-dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    xd = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[yd, xd].set(x[ys, xs])


def _neighbor_min(labels, class_map):
    """Min label over the 8-neighborhood, same-class neighbors only."""
    best = labels
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            lab = _shift(labels, dy, dx, _BIG)
            cls = _shift(class_map, dy, dx, -1)
            best = jnp.minimum(
                best, jnp.where(cls == class_map, lab, _BIG)
            )
    return best


def _compress(labels):
    """Pointer-jumping path compression: chase labels as indices."""
    flat = labels.reshape(-1)
    safe = jnp.where(flat == _BIG, 0, flat)
    jumped = jnp.where(flat == _BIG, _BIG, flat[safe])
    return jumped.reshape(labels.shape)


def _propagate(labels, class_map, update_mask, max_iters: int):
    """Fixed-point min-propagation restricted to ``update_mask`` pixels."""

    def body(carry):
        labels, _, it = carry
        new = jnp.where(
            update_mask,
            jnp.minimum(labels, _neighbor_min(labels, class_map)),
            labels,
        )
        # two compression hops ~O(log) the chain length; frozen pixels
        # (update_mask False) must not jump — their labels are final
        compressed = _compress(_compress(new))
        new = jnp.where(update_mask, compressed, new)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0))
    )
    return labels


@functools.partial(jax.jit, static_argnames=("max_iters",))
def connected_components(
    class_map, boundary=None, max_iters: int = 256
):
    """Per-class 8-connected components of a dense class map.

    Args:
      class_map: ``(H, W)`` int32, 0 = background.
      boundary: optional ``(H, W)`` bool — instance-separating pixels.
        Components form on ``class & ~boundary``; boundary pixels are
        then assigned to the nearest (geodesic) surviving core.
      max_iters: propagation bound (defensive; with path compression the
        fixed point lands in ~log(diameter) + carve-width steps).

    Returns:
      ``(H, W)`` int32: the component's minimal linear index per pixel,
      -1 in background.
    """
    H, W = class_map.shape
    class_map = class_map.astype(jnp.int32)
    fg = class_map > 0
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)

    if boundary is None:
        labels = jnp.where(fg, idx, _BIG)
        labels = _propagate(labels, class_map, fg, max_iters)
    else:
        core = fg & ~boundary.astype(bool)
        labels = jnp.where(core, idx, _BIG)
        labels = _propagate(labels, class_map, core, max_iters)
        # flood carved pixels from the frozen cores: only non-core fg
        # pixels update, so core labels cannot merge across a boundary
        carved = fg & ~core
        labels = _propagate(labels, class_map, carved, max_iters)
        # carved pixels with no reachable core stay background
        labels = jnp.where(labels == _BIG, _BIG, labels)

    return jnp.where(labels == _BIG, -1, labels)


def relabel_components(
    comp: "np.ndarray", class_map: "np.ndarray", min_area: int = 50
):
    """Host finalize: component keys -> consecutive instance ids.

    Returns ``(instance_label (H, W) int32 with -1 background,
    {instance_id: class_id})`` — the SegmentationNode output contract.
    ~0.5 ms on 240x320 (np.unique + a LUT), replacing the ~90 ms cv2
    per-class loop.
    """
    import numpy as np

    comp = np.asarray(comp)
    class_map = np.asarray(class_map)
    flat = comp.ravel()
    keys, inv, counts = np.unique(
        flat, return_inverse=True, return_counts=True
    )
    keep = (keys >= 0) & (counts >= min_area)
    new_ids = np.where(keep, np.cumsum(keep) - 1, -1).astype(np.int32)
    instance_label = new_ids[inv].reshape(comp.shape)
    instance_to_class = {}
    flat_cls = class_map.ravel()
    first_pix = {}
    for k_i, key in enumerate(keys):
        if keep[k_i]:
            first_pix[int(new_ids[k_i])] = int(key)
    for iid, key in first_pix.items():
        instance_to_class[iid] = int(flat_cls[key])
    return instance_label, instance_to_class
