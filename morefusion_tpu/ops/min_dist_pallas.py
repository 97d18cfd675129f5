"""Pallas TPU kernel: per-voxel min distance to a point set (+argmin).

The hot op of the pseudo-occupancy / TDF pipeline (and therefore of the
ICC joint refiner). For every voxel center of a dense (X, Y, Z) grid,
find the nearest point of a (P, 3) set:

- the grid tiles over voxels; each program holds its (TILE_V,) tile's
  coordinates (computed from iota — never loaded from HBM);
- points live VMEM-resident as an (8, P) transposed, K-padded block;
- each point chunk contributes a (TILE_V, CHUNK) squared-distance block
  via one MXU matmul (cross term) that never leaves VMEM;
- **composite-key min**: a naive per-chunk ``argmin`` is a cross-lane
  reduction that dominates the kernel (~5x the min-only cost). Instead
  the point index is packed into the low 14 mantissa bits of the d2
  float's bit pattern — positive IEEE-754 floats order identically to
  their int32 bits, so a single integer ``min`` reduce yields both the
  (quantized) min distance and its winner; the exact distance is
  recomputed outside with one gather. Tie-break = lowest index.

This is the Pallas analogue of the reference's atomicMin CUDA kernel
(``morefusion/functions/geometry/truncated_distance_function.py:44-93``),
redesigned as a gather/reduce instead of a scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IDX_BITS = 14
_IDX_MASK = (1 << _IDX_BITS) - 1  # 16383
MAX_POINTS = 1 << _IDX_BITS  # composite key fits P <= 16384


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_coords(tile, tile_v, dims):
    X, Y, Z = dims
    flat = (
        tile * tile_v
        + jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0)[:, 0]
    )
    ci = (flat // (Y * Z)).astype(jnp.float32)
    cj = ((flat // Z) % Y).astype(jnp.float32)
    ck = (flat % Z).astype(jnp.float32)
    zeros = jnp.zeros((tile_v,), jnp.float32)
    coords = jnp.stack(
        [ci, cj, ck, zeros, zeros, zeros, zeros, zeros], axis=1
    )  # (TILE_V, 8) K-padded for the MXU
    c2 = ci * ci + cj * cj + ck * ck
    return coords, c2


def _composite_min_body(coords, c2, pts_ref, p2_ref, chunk, lead):
    """Returns a fori_loop body computing the running composite-key min."""

    def body(c, key_min):
        p = pts_ref[lead + (slice(None), pl.ds(c * chunk, chunk))]
        pp = p2_ref[lead + (0, pl.ds(c * chunk, chunk))]
        cross = jnp.dot(
            coords,
            p,
            preferred_element_type=jnp.float32,
            # full fp32 passes: plain bf16 suffers catastrophic
            # cancellation in c2 - 2*cross + p2 (absolute error ~|cross|
            # * 2^-8 ~ 12 voxel-units^2), displacing winners far outside
            # the composite-key quantum
            precision=jax.lax.Precision.HIGHEST,
        )  # (TILE_V, CHUNK) — MXU
        d2 = c2[:, None] - 2.0 * cross + pp[None, :]
        # pack the point index into the low mantissa bits
        idx = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, d2.shape, dimension=1
        )
        bits = pltpu.bitcast(jnp.maximum(d2, 0.0), jnp.int32)
        comp = (bits & ~jnp.int32(_IDX_MASK)) | idx
        return jnp.minimum(key_min, jnp.min(comp, axis=1))

    return body


def _kernel(pts_ref, p2_ref, out_key_ref, *, dims, tile_v, chunk):
    coords, c2 = _tile_coords(pl.program_id(0), tile_v, dims)
    P = pts_ref.shape[-1]
    body = _composite_min_body(coords, c2, pts_ref, p2_ref, chunk, ())
    init = jnp.full((tile_v,), jnp.int32(0x7FFFFFFF))
    out_key_ref[:] = jax.lax.fori_loop(0, P // chunk, body, init)


def _kernel_batched(pts_ref, p2_ref, out_key_ref, *, dims, tile_v, chunk):
    coords, c2 = _tile_coords(pl.program_id(1), tile_v, dims)
    P = pts_ref.shape[-1]
    body = _composite_min_body(coords, c2, pts_ref, p2_ref, chunk, (0,))
    init = jnp.full((tile_v,), jnp.int32(0x7FFFFFFF))
    out_key_ref[:] = jax.lax.fori_loop(0, P // chunk, body, init)


def _prepare(ip, valid, chunk):
    """(B?, P, 3) -> transposed K-padded points + masked |p|^2."""
    P = ip.shape[-2]
    if P > MAX_POINTS:
        raise ValueError(
            f"P={P} exceeds composite-key capacity {MAX_POINTS}"
        )
    Pp = _round_up(max(P, chunk), chunk)
    ipf = jnp.nan_to_num(ip.astype(jnp.float32))
    big = jnp.float32(1e30)
    p2 = jnp.sum(ipf * ipf, axis=-1) + jnp.where(
        valid & ~jnp.any(jnp.isnan(ip), axis=-1), 0.0, big
    )
    if ip.ndim == 3:
        B = ip.shape[0]
        pts_t = (
            jnp.zeros((B, 8, Pp), jnp.float32)
            .at[:, :3, :P]
            .set(jnp.swapaxes(ipf, 1, 2))
        )
        p2_p = jnp.full((B, 1, Pp), big, jnp.float32).at[:, 0, :P].set(p2)
    else:
        pts_t = jnp.zeros((8, Pp), jnp.float32).at[:3, :P].set(ipf.T)
        p2_p = jnp.full((1, Pp), big, jnp.float32).at[0, :P].set(p2)
    return pts_t, p2_p, Pp


def _finalize(key, ip, valid):
    """Composite keys -> (exact d2 per voxel, winner index or -1)."""
    arg = key & jnp.int32(_IDX_MASK)  # (..., V)
    P = ip.shape[-2]
    arg = jnp.clip(arg, 0, P - 1)
    ipf = jnp.nan_to_num(ip.astype(jnp.float32))

    # exact winner distance: one gather + 9 flops per voxel
    if ip.ndim == 3:
        B, _, _ = ip.shape
        V = key.shape[-1]
        winner_pts = jnp.take_along_axis(
            ipf, arg[..., None].reshape(B, V, 1), axis=1
        )  # (B, V, 3)
        winner_valid = jnp.take_along_axis(valid, arg, axis=1)
    else:
        winner_pts = ipf[arg]
        winner_valid = valid[arg]
    return winner_pts, winner_valid, arg


def _centers_of(dims, V):
    X, Y, Z = dims
    idx = jnp.arange(V, dtype=jnp.int32)
    ci = (idx // (Y * Z)).astype(jnp.float32)
    cj = ((idx // Z) % Y).astype(jnp.float32)
    ck = (idx % Z).astype(jnp.float32)
    return jnp.stack([ci, cj, ck], axis=-1)  # (V, 3)


@functools.partial(jax.jit, static_argnames=("dims", "tile_v", "chunk"))
def min_dist_voxels_pallas(
    ip: jnp.ndarray,  # (P, 3) continuous voxel-space coordinates
    valid: jnp.ndarray,  # (P,) bool
    dims,
    tile_v: int = 2048,
    chunk: int = 512,
):
    """Returns (d2_min (V,), argmin (V,)) in voxel-coordinate units^2."""
    X, Y, Z = dims
    V = X * Y * Z
    assert V % tile_v == 0, (V, tile_v)
    pts_t, p2_p, Pp = _prepare(ip, valid, chunk)

    key = pl.pallas_call(
        functools.partial(_kernel, dims=dims, tile_v=tile_v, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((V,), jnp.int32),
        grid=(V // tile_v,),
        in_specs=[
            pl.BlockSpec((8, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_v,), lambda i: (i,), memory_space=pltpu.VMEM
        ),
    )(pts_t, p2_p)

    winner_pts, winner_valid, arg = _finalize(key, ip, valid)
    centers = _centers_of(dims, V)
    d2 = jnp.sum((winner_pts - centers) ** 2, axis=-1)
    d2 = jnp.where(winner_valid, d2, jnp.inf)
    arg = jnp.where(winner_valid, arg, -1)
    return d2, arg


@functools.partial(jax.jit, static_argnames=("dims", "tile_v", "chunk"))
def min_dist_voxels_pallas_batched(
    ip: jnp.ndarray,  # (B, P, 3)
    valid: jnp.ndarray,  # (B, P)
    dims,
    tile_v: int = 2048,
    chunk: int = 512,
):
    """Batched variant: explicit batch grid dimension (vmap of a Pallas
    call would produce block shapes the TPU lowering rejects).

    Returns (d2_min (B, V), argmin (B, V)).
    """
    X, Y, Z = dims
    V = X * Y * Z
    assert V % tile_v == 0, (V, tile_v)
    B = ip.shape[0]
    pts_t, p2_p, Pp = _prepare(ip, valid, chunk)

    n_tiles = V // tile_v
    key = pl.pallas_call(
        functools.partial(
            _kernel_batched, dims=dims, tile_v=tile_v, chunk=chunk
        ),
        out_shape=jax.ShapeDtypeStruct((B * V,), jnp.int32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 8, Pp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Pp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_v,),
            lambda b, i: (b * n_tiles + i,),
            memory_space=pltpu.VMEM,
        ),
    )(pts_t, p2_p)

    key = key.reshape(B, V)
    winner_pts, winner_valid, arg = _finalize(key, ip, valid)
    centers = _centers_of(dims, V)  # (V, 3)
    d2 = jnp.sum((winner_pts - centers[None]) ** 2, axis=-1)
    d2 = jnp.where(winner_valid, d2, jnp.inf)
    arg = jnp.where(winner_valid, arg, -1)
    return d2, arg
