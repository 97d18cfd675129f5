"""Truncated distance function + pseudo-occupancy voxelization.

TPU-native redesign of the reference's hardest CUDA kernel
(``morefusion/functions/geometry/truncated_distance_function.py``). Two
formulations with identical public semantics:

- ``truncated_distance_function`` (default, **dense streaming**): the grid
  is only 32^3 voxels, so instead of scattering per-point candidates with
  ``atomicMin`` (which XLA lowers to slow serialized scatters on TPU), we
  stream point chunks through a ``lax.scan`` computing the (V, chunk)
  squared-distance block via the MXU cross-term trick and keeping a running
  per-voxel (min, argmin). No scatter anywhere — this is what makes the
  ICC joint refiner fast. Gradients flow to the winning point through the
  running-min selects, reproducing the reference backward (grad pushed
  along the voxel->point unit vector).
  Note: this computes the *exact* truncated distance; the reference's
  CUDA kernel bounds the search to a ksize^3 neighborhood of each point and
  therefore misses a thin shell of voxels near the truncation radius
  (where the pseudo-occupancy weight ~ 0 anyway). We implement the exact
  field (the paper's math); parity tests use a dense oracle.

- ``truncated_distance_function_scatter``: the segment-min port of the
  reference kernel (kept for CPU-side uses and as a cross-check).

``pseudo_occupancy_voxelization`` converts TDF + per-point SDF values into
the (uniform / surface / inside) weighted occupancy grids driving the
collision loss (reference ``truncated_distance_function.py:181-213``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def _voxel_centers(dims, dtype):
    X, Y, Z = dims
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(X, dtype=dtype),
        jnp.arange(Y, dtype=dtype),
        jnp.arange(Z, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (V, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _min_dist(points, valid, payload_q, pitch, origin, dims, chunk):
    """Per-voxel (distance to nearest valid point, winner index, payload).

    The forward streams VMEM-sized (V, chunk) distance blocks (cross term
    on the MXU) and keeps a running min/argmin; the custom VJP avoids
    saving any block — the backward is two segment-sums back to the points
    (no gathers). ``payload_q`` (quantized per-point ints, e.g. SDF) rides
    along in a second composite key so callers never gather
    payload-by-winner. This keeps the ICC refiner's HBM traffic at
    O(V + P) per step instead of O(V x P).
    """
    dist, arg, payload = _min_dist_fwd_impl(
        points, valid, payload_q, pitch, origin, dims, chunk
    )
    return dist, arg, payload


def _pick_tile(V: int):
    """Largest voxel tile <= 2048 that divides V (None -> no Pallas path)."""
    for t in (2048, 1024, 512, 256, 128):
        if V % t == 0:
            return t
    return None


def _scan_core(ip, valid, dims, chunk):
    """Rank-2 streaming min/argmin in voxel-coordinate units^2 (XLA path)."""
    dtype = ip.dtype
    X, Y, Z = dims
    V = X * Y * Z
    P = ip.shape[0]

    centers = _voxel_centers((X, Y, Z), dtype)  # (V, 3)
    c2 = jnp.sum(centers * centers, axis=-1)  # (V,)

    n_chunks = max(1, -(-P // chunk))
    Pp = n_chunks * chunk
    ip_p = jnp.zeros((Pp, 3), dtype).at[:P].set(ip)
    valid_p = jnp.zeros((Pp,), bool).at[:P].set(valid)
    ip_c = ip_p.reshape(n_chunks, chunk, 3)
    valid_c = valid_p.reshape(n_chunks, chunk)

    big = jnp.asarray(jnp.inf, dtype)

    def body(carry, xs):
        d2_min, arg_min = carry
        pts, vmask, base = xs
        p2 = jnp.sum(pts * pts, axis=-1)
        cross = jnp.dot(
            centers,
            pts.T,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # (V, chunk)
        d2 = c2[:, None] + p2[None, :] - 2.0 * cross
        d2 = jnp.where(vmask[None, :], d2, big)
        chunk_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        chunk_min = jnp.take_along_axis(d2, chunk_arg[:, None], axis=1)[:, 0]
        better = chunk_min < d2_min
        d2_min = jnp.where(better, chunk_min, d2_min)
        arg_min = jnp.where(better, base + chunk_arg, arg_min)
        return (d2_min, arg_min), None

    init = (jnp.full((V,), big, dtype), jnp.full((V,), -1, jnp.int32))
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (d2_min, arg_min), _ = jax.lax.scan(body, init, (ip_c, valid_c, bases))
    arg_min = jnp.where(jnp.isinf(d2_min), -1, arg_min)
    return d2_min, arg_min


def _min_dist_fwd_impl(points, valid, payload_q, pitch, origin, dims, chunk):
    """Rank-generic: points (..., P, 3); pitch (...,); origin (..., 3)."""
    dtype = points.dtype
    X, Y, Z = dims
    V = X * Y * Z
    batched = points.ndim == 3

    pitch_t = jnp.asarray(pitch, dtype=dtype)
    origin_arr = jnp.asarray(origin, dtype=dtype)

    # continuous voxel coordinates; distances in voxel units x pitch
    if batched:
        ip = (points - origin_arr[:, None, :]) / pitch_t[:, None, None]
    else:
        ip = (points - origin_arr) / pitch_t
    nan_bad = jnp.any(jnp.isnan(ip), axis=-1)
    valid = valid & ~nan_bad
    ip = jnp.nan_to_num(ip)

    if payload_q is None:
        payload_q = jnp.zeros(points.shape[:-1], jnp.int32)

    # TPU fast path: Pallas streaming kernel (MXU cross term, running
    # min/argmin in VMEM — O(V + P) HBM traffic). Point sets beyond the
    # composite-key index capacity fall back to the XLA scan path below.
    if jax.default_backend() != "cpu" and dtype == jnp.float32:
        from ..ops.min_dist_pallas import MAX_POINTS

        tile_v = _pick_tile(V)
        if tile_v is not None and points.shape[-2] <= MAX_POINTS:
            from ..ops.min_dist_pallas import (
                min_dist_voxels_pallas_payload,
            )

            d2_min, arg_min, payload = min_dist_voxels_pallas_payload(
                ip, valid, payload_q, (X, Y, Z), tile_v=tile_v
            )
            scale = pitch_t[:, None] if batched else pitch_t
            dist = scale * jnp.sqrt(jnp.maximum(d2_min, 1e-12))
            return dist, arg_min, payload

    if batched:
        d2_min, arg_min = jax.vmap(
            lambda a, b: _scan_core(a, b, dims, chunk)
        )(ip, valid)
        dist = pitch_t[:, None] * jnp.sqrt(jnp.maximum(d2_min, 1e-12))
        payload = jnp.take_along_axis(
            payload_q, jnp.clip(arg_min, 0, None), axis=1
        )
    else:
        d2_min, arg_min = _scan_core(ip, valid, dims, chunk)
        dist = pitch_t * jnp.sqrt(jnp.maximum(d2_min, 1e-12))
        payload = payload_q[jnp.clip(arg_min, 0, None)]
    payload = jnp.where(arg_min >= 0, payload, 0)
    return dist, arg_min, payload


def _min_dist_fwd(points, valid, payload_q, pitch, origin, dims, chunk):
    dist, arg, payload = _min_dist_fwd_impl(
        points, valid, payload_q, pitch, origin, dims, chunk
    )
    return (dist, arg, payload), (points, pitch, origin, dist, arg)


def _min_dist_bwd(dims, chunk, res, cts):
    points, pitch, origin, dist, arg = res
    g_dist, _, _ = cts  # integer-output cotangents are symbolic zeros
    dtype = points.dtype
    X, Y, Z = dims

    def one(points_i, pitch_i, origin_i, dist_i, arg_i, g_i):
        P = points_i.shape[0]
        centers = _voxel_centers((X, Y, Z), dtype)  # (V, 3) index units
        centers_world = origin_i + centers * pitch_i
        hit = (arg_i >= 0) & jnp.isfinite(dist_i)
        w = jnp.where(hit, arg_i, P)  # dump segment for empty voxels
        # d dist / d p_w = (p_w - c_v) / dist. Split algebraically so the
        # backward is scatter-only:
        #   dL/dp_w = p_w * sum_v(g/d) - sum_v(g * c_v / d)
        # — a (B, V)-row gather of points here would cost more than the
        # whole forward kernel on TPU.
        a = jnp.where(hit, g_i / jnp.maximum(dist_i, 1e-12), 0.0)  # (V,)
        A = jax.ops.segment_sum(a, w, num_segments=P + 1)[:-1]  # (P,)
        B = jax.ops.segment_sum(
            a[:, None] * centers_world, w, num_segments=P + 1
        )[:-1]  # (P, 3)
        # nan_to_num: NaN input points must yield zero grads (their A/B are
        # zero, but NaN * 0 = NaN)
        return jnp.nan_to_num(points_i) * A[:, None] - B

    pitch_t = jnp.asarray(pitch, dtype)
    origin_t = jnp.asarray(origin, dtype)
    if points.ndim == 3:
        g_points = jax.vmap(one)(
            points, pitch_t, origin_t, dist, arg, g_dist
        )
    else:
        g_points = one(points, pitch_t, origin_t, dist, arg, g_dist)
    return (
        g_points,
        None,
        None,
        jnp.zeros_like(pitch_t),
        jnp.zeros_like(origin_t),
    )


_min_dist.defvjp(_min_dist_fwd, _min_dist_bwd)


def truncated_distance_function(
    points: jnp.ndarray,
    *,
    pitch,
    origin,
    dims,
    truncation,
    return_indices: bool = False,
    point_mask: Optional[jnp.ndarray] = None,
    chunk: int = 128,
    ksize: int = None,  # accepted for API compat; unused (exact field)
    payload_q: Optional[jnp.ndarray] = None,
    return_payload: bool = False,
):
    """Per-voxel truncated distance to the nearest point (dense streaming).

    Args:
      points: ``(P, 3)`` or batched ``(B, P, 3)`` world-frame points
        (differentiable). Batched inputs take per-lane pitch ``(B,)``,
        origin ``(B, 3)``, truncation ``(B,)`` and avoid ``vmap`` (the
        Pallas fast path has an explicit batch grid).
      pitch / truncation: may be traced scalars (e.g. under vmap).
      origin: ``(3,)`` grid origin.
      dims: ``(X, Y, Z)``.
      return_indices: also return winning point index per voxel (-1 where
        no point within truncation).
      point_mask: optional ``(P,)`` validity mask for padded point sets.
      chunk: point-chunk size; (V, chunk) blocks should fit VMEM.

    Returns:
      ``(X, Y, Z)`` (or ``(B, X, Y, Z)``) distances in ``[0, truncation]``.
    """
    del ksize
    points = jnp.asarray(points)
    dtype = points.dtype
    X, Y, Z = (int(d) for d in dims)
    batched = points.ndim == 3
    pshape = points.shape[:-1]  # (P,) or (B, P)

    trunc_t = jnp.asarray(truncation, dtype=dtype)
    trunc_b = trunc_t[:, None] if batched else trunc_t
    valid = (
        jnp.ones(pshape, bool) if point_mask is None else jnp.asarray(point_mask)
    )

    dist, arg_min, payload = _min_dist(
        points,
        valid,
        payload_q,
        jnp.asarray(pitch, dtype),
        jnp.asarray(origin, dtype),
        (X, Y, Z),
        int(chunk),
    )  # (V,) or (B, V)
    out_shape = (X, Y, Z) if not batched else (-1, X, Y, Z)
    tdf = jnp.minimum(dist, trunc_b).reshape(out_shape)

    if not (return_indices or return_payload):
        return tdf
    hit = (jax.lax.stop_gradient(dist) < trunc_b) & (arg_min >= 0)
    out = (tdf,)
    if return_indices:
        indices = jnp.where(hit, arg_min, -1).reshape(out_shape)
        out += (jax.lax.stop_gradient(indices),)
    if return_payload:
        pay = jnp.where(hit, payload, -1).reshape(out_shape)
        out += (jax.lax.stop_gradient(pay),)
    return out if len(out) > 1 else out[0]


def _tdf_kernel_offsets(ksize: int) -> jnp.ndarray:
    r = jnp.arange(ksize, dtype=jnp.int32) - ksize // 2
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # (K, 3)


def truncated_distance_function_scatter(
    points: jnp.ndarray,
    *,
    pitch,
    origin,
    dims,
    truncation,
    return_indices: bool = False,
    ksize: int = None,
):
    """Segment-min port of the reference CUDA kernel (neighborhood-bounded).

    Kept as a cross-check; the dense streaming version above is the
    production path on TPU.
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
    offsets = _tdf_kernel_offsets(ksize)
    K = offsets.shape[0]

    origin_arr = jnp.asarray(origin, dtype=dtype)
    ip = (points - origin_arr) / pitch_t
    center = jnp.round(ip).astype(jnp.int32)

    vox = center[:, None, :] + offsets[None, :, :]  # (P, K, 3)
    dims_arr = jnp.asarray([X, Y, Z], dtype=jnp.int32)
    in_bounds = jnp.all((vox >= 0) & (vox < dims_arr), axis=-1)

    delta = ip[:, None, :] - vox.astype(dtype)
    dist = pitch_t * jnp.sqrt(jnp.sum(delta**2, axis=-1))

    valid = in_bounds & (dist < trunc_t)
    lin = (vox[..., 0] * Y + vox[..., 1]) * Z + vox[..., 2]
    seg = jnp.where(valid, lin, n_voxels).reshape(-1)

    dist_flat = jnp.where(valid, dist, trunc_t).reshape(-1)
    tdf = jax.ops.segment_min(dist_flat, seg, num_segments=n_voxels + 1)[:-1]
    tdf = jnp.minimum(tdf, trunc_t).reshape(X, Y, Z)

    if not return_indices:
        return tdf

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
    point_mask: Optional[jnp.ndarray] = None,
):
    """Convert points + per-point SDF values into three weighted occupancy
    grids (uniform / surface / inside).

    Matches the reference's formula
    (``morefusion/functions/geometry/truncated_distance_function.py:181-213``):
    ``grid = 1 - tdf/truncation`` with ``truncation = threshold * pitch``;
    inside-weight = winning point's SDF (+offset, clipped at 0,
    max-normalized); surface-weight = inside-weight with positives flipped
    to ``1 - w``.

    Args:
      points: ``(P, 3)`` or batched ``(B, P, 3)`` (differentiable — this is
        the collision-loss input). Batched inputs take ``sdf (B, P)``,
        per-lane pitch/origin/mask, and return ``(B, X, Y, Z)`` grids.
      sdf: ``(P,)`` inside-positive distance of each point in its CAD model.
      point_mask: optional ``(P,)`` validity mask for padded point sets.

    Returns:
      ``(grid_uniform, grid_surface, grid_inside)``, each ``(X, Y, Z)``.
    """
    points = jnp.asarray(points)
    batched = points.ndim == 3
    truncation = jnp.asarray(threshold) * jnp.asarray(pitch)

    # Quantize the SDF to the composite-key payload width so the winning
    # point's weight comes out of the kernel directly — no (B, V)-row
    # gather (which costs more than the distance kernel itself on TPU).
    sdf = jnp.asarray(sdf, jnp.float32)
    sdf_max = jnp.max(sdf, axis=-1, keepdims=True)
    sdf_scale = jnp.maximum(sdf_max, jnp.finfo(jnp.float32).tiny)
    sdf_q = jnp.clip(
        jnp.round(sdf / sdf_scale * 16383.0), 0, 16383
    ).astype(jnp.int32)

    tdf, payload = truncated_distance_function(
        points,
        pitch=pitch,
        origin=origin,
        dims=dims,
        truncation=truncation,
        return_payload=True,
        point_mask=point_mask,
        payload_q=sdf_q,
    )
    trunc_b = (
        truncation[:, None, None, None] if batched else truncation
    )
    grid = 1.0 - tdf / trunc_b  # [0, 1], differentiable w.r.t. points

    hit = payload >= 0
    scale_b = (
        sdf_scale[:, 0][:, None, None, None] if batched else sdf_scale[0]
    )
    picked = payload.astype(grid.dtype) / 16383.0 * scale_b
    weight_inside = jnp.where(hit, picked, -1.0) + sdf_offset
    neg = weight_inside < 0
    weight_inside = jnp.where(neg, 0.0, weight_inside)
    reduce_axes = (1, 2, 3) if batched else None
    wmax = jnp.max(weight_inside, axis=reduce_axes, keepdims=batched)
    weight_inside = weight_inside / jnp.maximum(
        wmax, jnp.finfo(grid.dtype).tiny
    )

    weight_surface = jnp.where(neg, weight_inside, 1.0 - weight_inside)

    return grid, grid * weight_surface, grid * weight_inside
