"""Pallas tiled nearest-neighbor kernel.

TPU-native counterpart of the reference's tiled shared-memory CUDA distance
kernel (``morefusion/geometry/knn/cuComputeDistanceGlobal.cu:1-86``): the
reference set streams through VMEM in sublane-major blocks, query tiles
live on the lane axis, the cross term ``r . q^T`` rides the MXU, and the
argmin is carried as a composite value+index key (the same layout as
``ops/min_dist_pallas.py`` — a naive per-tile ``jnp.argmin`` materializes
VMEM-breaking intermediates and the full (Q, R) distance matrix never fits
HBM budgets at production sizes).

Used (indices only, no gradient) by the symmetric ADD-S loss and metrics;
``functions/knn.py::nn`` is the plain-XLA twin for small problems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IDX_BITS = 14
_IDX_MASK = (1 << _IDX_BITS) - 1
MAX_REF = 1 << _IDX_BITS  # composite key fits R <= 16384
_R_SUB = 2048  # reference points per streamed VMEM block
_MAXINT = 0x7FFFFFFF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    q_ref,  # (8, TILE_Q) query tile, coords in rows 0..2
    r_ref,  # (1, R_SUB, 8) sublane-major reference block
    r2_ref,  # (1, R_SUB, 1) masked |r|^2 (padded rows ~1e30)
    out_ref,  # (TILE_Q,) composite keys (written on the last visit)
    acc_ref,  # VMEM scratch (TILE_Q,) int32
    *,
    tile_q,
    chunk,
    r_sub,
):
    s = pl.program_id(1)
    n_super = pl.num_programs(1)

    q_t = q_ref[:]  # (8, TILE_Q)
    q2 = jnp.sum(q_t * q_t, axis=0)  # (TILE_Q,)

    def body(c, key_min):
        r_t = r_ref[0, pl.ds(c * chunk, chunk), :]  # (CHUNK, 8)
        rr = r2_ref[0, pl.ds(c * chunk, chunk), 0]  # (CHUNK,)
        cross = jnp.dot(
            r_t,
            q_t,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CHUNK, TILE_Q) — MXU; query tile on the lane axis
        d2 = rr[:, None] - 2.0 * cross + q2[None, :]
        idx = (
            s * r_sub
            + c * chunk
            + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        )
        bits = pltpu.bitcast(jnp.maximum(d2, 0.0), jnp.int32) & ~jnp.int32(
            _IDX_MASK
        )
        return jnp.minimum(key_min, jnp.min(bits | idx, axis=0))

    local = jax.lax.fori_loop(
        0, r_sub // chunk, body, jnp.full((tile_q,), _MAXINT, jnp.int32)
    )

    @pl.when(s == 0)
    def _():
        acc_ref[:] = local

    @pl.when(s > 0)
    def _():
        acc_ref[:] = jnp.minimum(acc_ref[:], local)

    @pl.when(s == n_super - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_q", "chunk"))
def nn_pallas(
    ref: jnp.ndarray,
    query: jnp.ndarray,
    tile_q: int = 2048,
    chunk: int = 256,
    block_q: int = None,  # accepted for API compat; unused
):
    """Index into ``ref`` (R, 3) of the nearest neighbor of each ``query``
    (Q, 3) point. Same contract as ``functions.knn.nn``."""
    del block_q
    R, D = ref.shape
    Q, _ = query.shape
    if R > MAX_REF:
        raise ValueError(f"R={R} exceeds composite-key capacity {MAX_REF}")

    Rp = _round_up(max(R, _R_SUB), _R_SUB)
    Qp = _round_up(max(Q, tile_q), tile_q)

    big = jnp.float32(1e30)
    ref_f = ref.astype(jnp.float32)
    r2 = jnp.sum(ref_f * ref_f, axis=-1)
    r_pts = jnp.zeros((1, Rp, 8), jnp.float32).at[0, :R, :D].set(ref_f)
    r2_p = jnp.full((1, Rp, 1), big, jnp.float32).at[0, :R, 0].set(r2)
    q_t = (
        jnp.zeros((8, Qp), jnp.float32)
        .at[:D, :Q]
        .set(query.astype(jnp.float32).T)
    )

    n_tiles = Qp // tile_q
    n_super = Rp // _R_SUB
    key = pl.pallas_call(
        functools.partial(
            _kernel, tile_q=tile_q, chunk=chunk, r_sub=_R_SUB
        ),
        out_shape=jax.ShapeDtypeStruct((Qp,), jnp.int32),
        grid=(n_tiles, n_super),
        in_specs=[
            pl.BlockSpec(
                (8, tile_q), lambda i, s: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _R_SUB, 8), lambda i, s: (0, s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _R_SUB, 1), lambda i, s: (0, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_q,), lambda i, s: (i,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tile_q,), jnp.int32)],
    )(q_t, r_pts, r2_p)
    return jax.lax.stop_gradient((key & jnp.int32(_IDX_MASK))[:Q])
