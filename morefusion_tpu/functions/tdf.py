"""Truncated distance function + pseudo-occupancy voxelization.

TPU-native redesign of the reference's hardest CUDA kernel
(``morefusion/functions/geometry/truncated_distance_function.py``): the
``atomicMin``-with-winner-index scatter becomes a deterministic two-pass
``segment_min`` over (point x kernel-offset) candidate pairs:

  1. every point emits ``ksize**3`` candidate (voxel, distance) pairs;
  2. ``segment_min`` reduces candidates per voxel (differentiable — JAX's
     scatter-min routes the gradient to the winning candidate, which is
     exactly the reference backward: grad pushed along the unit vector from
     winning voxel to winning point);
  3. the winner's flat candidate index is recovered with a second
     ``segment_min`` over index-where-distance-equals-min for
     ``return_indices`` (needed by ``pseudo_occupancy_voxelization`` to look
     up the winning point's SDF value).

``pseudo_occupancy_voxelization`` converts a TDF + per-point SDF values into
the (uniform / surface / inside) weighted occupancy grids that drive the
collision loss (reference ``truncated_distance_function.py:181-213``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _tdf_kernel_offsets(ksize: int) -> jnp.ndarray:
    """Integer offsets of the ksize^3 neighborhood, centered."""
    r = jnp.arange(ksize, dtype=jnp.int32) - ksize // 2
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # (K, 3)


def truncated_distance_function(
    points: jnp.ndarray,
    *,
    pitch,
    origin,
    dims,
    truncation,
    return_indices: bool = False,
    ksize: int = None,
):
    """Per-voxel truncated distance to the nearest point.

    Only voxels within a ``ksize**3`` neighborhood of some point (where
    ``ksize = ceil(truncation / pitch)`` rounded up to odd) get a distance;
    everything else stays at ``truncation``.

    Args:
      points: ``(P, 3)`` world-frame points (differentiable).
      pitch: voxel size.
      origin: ``(3,)`` grid origin.
      dims: ``(X, Y, Z)``.
      truncation: max distance (same units as points).
      return_indices: also return the winning **point** index per voxel
        (``-1`` where no point is within truncation).
      ksize: static neighborhood size; required when ``pitch``/``truncation``
        are traced values (e.g. under ``vmap`` with per-sample pitch), since
        the candidate-pair shape must be static.

    Returns:
      ``(X, Y, Z)`` distance grid in ``[0, truncation]``.
    """
    points = jnp.asarray(points)
    dtype = points.dtype
    X, Y, Z = (int(d) for d in dims)
    n_voxels = X * Y * Z
    P = points.shape[0]

    pitch_t = jnp.asarray(pitch, dtype=dtype)
    trunc_t = jnp.asarray(truncation, dtype=dtype)
    if ksize is None:
        ksize = int(math.ceil(float(truncation) / float(pitch)))
    if ksize % 2 == 0:
        ksize += 1
    offsets = _tdf_kernel_offsets(ksize)  # (K, 3)
    K = offsets.shape[0]

    origin_arr = jnp.asarray(origin, dtype=dtype)
    ip = (points - origin_arr) / pitch_t  # (P, 3) continuous voxel coords
    center = jnp.round(ip).astype(jnp.int32)  # (P, 3)

    vox = center[:, None, :] + offsets[None, :, :]  # (P, K, 3)
    dims_arr = jnp.asarray([X, Y, Z], dtype=jnp.int32)
    in_bounds = jnp.all((vox >= 0) & (vox < dims_arr), axis=-1)  # (P, K)

    # Distance from each candidate voxel (integer coords) to the point
    # (continuous coords), in world units.
    delta = ip[:, None, :] - vox.astype(dtype)  # (P, K, 3)
    dist = pitch_t * jnp.sqrt(jnp.sum(delta**2, axis=-1))  # (P, K)

    valid = in_bounds & (dist < trunc_t)
    lin = (vox[..., 0] * Y + vox[..., 1]) * Z + vox[..., 2]  # (P, K)
    seg = jnp.where(valid, lin, n_voxels).reshape(-1)

    # Invalid candidates carry `truncation` so they never win; the dump
    # segment absorbs their (zero) gradient.
    dist_flat = jnp.where(valid, dist, trunc_t).reshape(-1)
    tdf = jax.ops.segment_min(
        dist_flat, seg, num_segments=n_voxels + 1
    )[:-1]
    # Voxels hit by no candidate come out as +inf from segment_min's
    # identity; clamp them to truncation without killing gradients of real
    # minima (which are < truncation by construction).
    tdf = jnp.minimum(tdf, trunc_t)
    tdf = tdf.reshape(X, Y, Z)

    if not return_indices:
        return tdf

    # Winner recovery: flat candidate index whose distance equals the min.
    pair_idx = jnp.arange(P * K, dtype=jnp.int32)
    tdf_flat = jax.lax.stop_gradient(tdf).reshape(-1)
    d_ng = jax.lax.stop_gradient(dist_flat)
    seg_safe = jnp.clip(seg, 0, n_voxels - 1)
    is_winner = (seg < n_voxels) & (d_ng <= tdf_flat[seg_safe])
    BIG = jnp.int32(P * K)
    winner_pair = jax.ops.segment_min(
        jnp.where(is_winner, pair_idx, BIG), seg, num_segments=n_voxels + 1
    )[:-1]
    point_idx = jnp.where(winner_pair < BIG, winner_pair // K, -1)
    return tdf, jax.lax.stop_gradient(point_idx.reshape(X, Y, Z))


def pseudo_occupancy_voxelization(
    points: jnp.ndarray,
    sdf: jnp.ndarray,
    *,
    pitch,
    origin,
    dims,
    threshold=1,
    sdf_offset=0,
):
    """Convert points + per-point SDF values into three weighted occupancy
    grids (uniform / surface / inside).

    Matches the reference's formula
    (``morefusion/functions/geometry/truncated_distance_function.py:181-213``):
    ``grid = 1 - tdf/truncation`` with ``truncation = threshold * pitch``;
    inside-weight = winning point's SDF (+offset, clipped at 0, max-normalized);
    surface-weight = inside-weight with positives flipped to ``1 - w``.

    Args:
      points: ``(P, 3)`` (differentiable — this is the collision-loss input).
      sdf: ``(P,)`` signed-distance value of each point inside its CAD model.

    Returns:
      ``(grid_uniform, grid_surface, grid_inside)``, each ``(X, Y, Z)``.
    """
    # truncation = threshold * pitch, so the neighborhood size depends only
    # on the (static) threshold — pitch may be a traced per-sample value.
    truncation = jnp.asarray(threshold) * jnp.asarray(pitch)
    ksize = int(math.ceil(float(threshold)))
    tdf, indices = truncated_distance_function(
        points,
        pitch=pitch,
        origin=origin,
        dims=dims,
        truncation=truncation,
        return_indices=True,
        ksize=ksize,
    )
    grid = 1.0 - tdf / truncation  # [0, 1], differentiable w.r.t. points

    sdf = jnp.asarray(sdf, dtype=grid.dtype)
    hit = indices >= 0
    idx_safe = jnp.where(hit, indices, 0)
    weight_inside = jnp.where(hit, sdf[idx_safe], -1.0) + sdf_offset
    neg = weight_inside < 0
    weight_inside = jnp.where(neg, 0.0, weight_inside)
    weight_inside = weight_inside / jnp.maximum(
        jnp.max(weight_inside), jnp.finfo(grid.dtype).tiny
    )

    weight_surface = jnp.where(neg, weight_inside, 1.0 - weight_inside)

    return grid, grid * weight_surface, grid * weight_inside
