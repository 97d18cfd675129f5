"""Nearest-neighbor queries as MXU-friendly distance matmuls.

TPU-native replacement for the reference's brute-force CUDA KNN kernel
(``morefusion/geometry/knn/cuComputeDistanceGlobal.cu`` +
``morefusion/geometry/knn/nn.py``): the tiled shared-memory pairwise-distance
kernel becomes ``|q|^2 + |r|^2 - 2 q.r^T`` — the cross term is a single
matmul that rides the MXU, and XLA fuses the rank-1 corrections and argmin.
Used (indices only, no gradient) by the symmetric ADD-S loss and metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances ``(N, M)`` between rows of a (N,D), b (M,D)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a2 = jnp.sum(a**2, axis=-1)[:, None]
    b2 = jnp.sum(b**2, axis=-1)[None, :]
    # HIGHEST precision: bf16 MXU passes would corrupt the argmin. D=3 is
    # tiny, so the fp32 matmul is still bandwidth-bound, not FLOPs-bound.
    cross = jnp.dot(
        a,
        b.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


def nn(ref: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Index into ``ref`` of the nearest neighbor of each ``query`` point.

    Reference: ``morefusion/geometry/knn/nn.py:52-57`` (same contract:
    returns ``(Q,)`` int indices; no gradient flows through indices).
    """
    d = pairwise_sq_dist(jnp.asarray(query), jnp.asarray(ref))  # (Q, R)
    return jax.lax.stop_gradient(jnp.argmin(d, axis=-1).astype(jnp.int32))
