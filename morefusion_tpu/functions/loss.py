"""Pose losses (ADD / ADD-S average distance).

TPU-native equivalent of the reference's DenseFusion pose loss
(``morefusion/functions/loss/average_distance.py:40-85``): mean Euclidean
distance between CAD points under predicted vs. true transforms; the
symmetric variant (ADD-S) replaces true points by their nearest neighbors
under the prediction (indices are non-differentiable, as in the reference).

Everything here is shaped for ``vmap`` over the batch — the reference's
per-sample Python loop (``model.py:406-475``) becomes one fused XLA graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import nn
from .transforms import transform_points


def average_distance(
    points: jnp.ndarray,
    transform_true: jnp.ndarray,
    transforms_pred: jnp.ndarray,
    symmetric: bool = False,
) -> jnp.ndarray:
    """ADD (or ADD-S) between one true pose and ``n_pred`` predicted poses.

    Args:
      points: ``(N, 3)`` CAD model points.
      transform_true: ``(4, 4)``.
      transforms_pred: ``(M, 4, 4)``.
      symmetric: use nearest-neighbor correspondence (ADD-S).

    Returns:
      ``(M,)`` mean distances.
    """
    n_points = points.shape[0]
    points_true = transform_points(points, transform_true)  # (N, 3)
    points_pred = transform_points(points, transforms_pred)  # (M, N, 3)
    M = points_pred.shape[0]

    if symmetric:
        query = points_pred.reshape(M * n_points, 3)
        indices = nn(jax.lax.stop_gradient(points_true), jax.lax.stop_gradient(query))
        matched = points_true[indices].reshape(M, n_points, 3)
    else:
        matched = points_true[None]

    d = jnp.sqrt(jnp.sum((matched - points_pred) ** 2, axis=-1) + 1e-12)
    return jnp.mean(d, axis=-1)


def average_distance_both(
    points: jnp.ndarray,
    transform_true: jnp.ndarray,
    transforms_pred: jnp.ndarray,
):
    """Return (ADD, ADD-S) together, sharing the transformed point clouds.

    Convenience for schedules that switch between ``add`` and ``add/add_s``
    per class (the reference selects per class with a symmetric-id table,
    ``model.py:416-434``); computing both and ``jnp.where``-selecting keeps
    the graph static under jit.
    """
    add = average_distance(points, transform_true, transforms_pred, False)
    add_s = average_distance(points, transform_true, transforms_pred, True)
    return add, add_s


def densefusion_confidence_loss(
    add: jnp.ndarray,
    confidence: jnp.ndarray,
    lambda_confidence: float = 0.015,
) -> jnp.ndarray:
    """DenseFusion confidence weighting: ``mean(add*c - lambda*log(c))``.

    Reference: ``model.py:437-441``. ``confidence`` entries of 0 are masked
    out (the reference filters ``confidence > 0`` before the mean).
    """
    keep = confidence > 0
    c = jnp.where(keep, confidence, 1.0)
    terms = add * confidence - lambda_confidence * jnp.log(c)
    terms = jnp.where(keep, terms, 0.0)
    return jnp.sum(terms) / jnp.maximum(jnp.sum(keep), 1)
