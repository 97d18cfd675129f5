"""Pallas tiled nearest-neighbor kernel.

TPU-native counterpart of the reference's tiled shared-memory CUDA distance
kernel (``morefusion/geometry/knn/cuComputeDistanceGlobal.cu:1-86``): query
tiles stream through VMEM, the reference set stays resident, the cross term
``q . r^T`` rides the MXU, and the argmin is fused into the same kernel so
the full (Q, R) distance matrix never hits HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nn_kernel(q_ref, r_ref, out_ref, *, r_valid: int):
    q = q_ref[:]  # (TQ, D)
    r = r_ref[:]  # (R, D)
    # ||q - r||^2 = |q|^2 + |r|^2 - 2 q.r^T ; |q|^2 is constant per row and
    # does not affect the argmin, so skip it.
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)  # (TQ, R)
    r2 = jnp.sum(r * r, axis=-1)[None, :]  # (1, R)
    d = r2 - 2.0 * cross
    # Mask padded reference rows.
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    d = jnp.where(col < r_valid, d, jnp.inf)
    out_ref[:] = jnp.argmin(d, axis=-1).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q",))
def nn_pallas(ref: jnp.ndarray, query: jnp.ndarray, block_q: int = 1024):
    """Index into ``ref`` (R, 3) of the nearest neighbor of each ``query``
    (Q, 3) point. Same contract as ``functions.knn.nn``."""
    R, D = ref.shape
    Q, _ = query.shape

    Rp = _round_up(max(R, 8), 128)
    Qp = _round_up(max(Q, 8), block_q)
    ref_p = jnp.zeros((Rp, D), ref.dtype).at[:R].set(ref)
    query_p = jnp.zeros((Qp, D), query.dtype).at[:Q].set(query)

    out = pl.pallas_call(
        functools.partial(_nn_kernel, r_valid=R),
        out_shape=jax.ShapeDtypeStruct((Qp,), jnp.int32),
        grid=(Qp // block_q,),
        in_specs=[
            pl.BlockSpec((block_q, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rp, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q,), lambda i: (i,), memory_space=pltpu.VMEM),
    )(query_p, ref_p)
    return out[:Q]
