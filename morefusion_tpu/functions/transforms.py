"""Differentiable SE(3) / quaternion transform math.

TPU-native equivalents of the reference's Chainer Functions
(``morefusion/functions/geometry/{quaternion_matrix,compose_transform,
transformation_matrix,translation_matrix,transform_points}.py``): pure
``jax.numpy`` — autodiff supplies the backward passes the reference wrote by
hand, and everything composes with ``vmap``/``jit``.

Quaternion convention is ``(w, x, y, z)`` (matching the reference, which uses
``trimesh.transformations``-style quaternions).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_matrix(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) -> 4x4 homogeneous rotation matrix(es).

    The quaternion is normalized internally, so gradients flow through the
    normalization (same behavior as the reference's
    ``quaternion_matrix``, reference file
    ``morefusion/functions/geometry/quaternion_matrix.py:66-78``).

    Args:
      quaternion: ``(4,)`` or ``(..., 4)`` array, ``(w, x, y, z)``.

    Returns:
      ``(4, 4)`` or ``(..., 4, 4)`` homogeneous transform with zero
      translation.
    """
    q = jnp.asarray(quaternion)
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None]

    batch_shape = q.shape[:-1]
    q = q.reshape(-1, 4)

    norm_sq = jnp.sum(q**2, axis=1, keepdims=True)
    # Reference scales by sqrt(2 / |q|^2) then uses the outer-product form.
    q = q * jnp.sqrt(2.0 / norm_sq)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    # Outer products (already carry the factor of 2 from the scaling above).
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    one = jnp.ones_like(w)
    zero = jnp.zeros_like(w)
    rows = [
        [1 - yy - zz, xy - wz, xz + wy, zero],
        [xy + wz, 1 - xx - zz, yz - wx, zero],
        [xz - wy, yz + wx, 1 - xx - yy, zero],
        [zero, zero, zero, one],
    ]
    T = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    T = T.reshape(*batch_shape, 4, 4)
    if squeeze:
        T = T[0]
    return T


def compose_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> 4x4 homogeneous transform(s).

    Reference: ``morefusion/functions/geometry/compose_transform.py:37-48``.

    Args:
      R: ``(3, 3)`` or ``(..., 3, 3)`` rotations.
      t: ``(3,)`` or ``(..., 3)`` translations.
    """
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    squeeze = R.ndim == 2
    if squeeze:
        R, t = R[None], t[None]

    batch_shape = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
        (*batch_shape, 1, 4),
    )
    T = jnp.concatenate([top, bottom], axis=-2)
    if squeeze:
        T = T[0]
    return T


def translation_matrix(translation: jnp.ndarray) -> jnp.ndarray:
    """Translation(s) -> 4x4 homogeneous transform(s).

    Reference: ``morefusion/functions/geometry/translation_matrix.py``.
    """
    t = jnp.asarray(translation)
    squeeze = t.ndim == 1
    if squeeze:
        t = t[None]
    batch_shape = t.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*batch_shape, 3, 3))
    T = compose_transform(eye, t)
    if squeeze:
        T = T[0]
    return T


def transformation_matrix(
    quaternion: jnp.ndarray, translation: jnp.ndarray
) -> jnp.ndarray:
    """(quaternion, translation) -> 4x4 homogeneous transform(s).

    Reference: ``morefusion/functions/geometry/transformation_matrix.py:5-18``.
    """
    T = quaternion_matrix(quaternion)
    return compose_transform(T[..., :3, :3], translation)


def transform_points(
    points: jnp.ndarray, transform: jnp.ndarray
) -> jnp.ndarray:
    """Apply homogeneous transform(s) to points.

    Reference: ``morefusion/functions/geometry/transform_points.py:6-30``.

    Args:
      points: ``(N, 3)``.
      transform: ``(4, 4)`` -> returns ``(N, 3)``;
        ``(M, 4, 4)`` -> returns ``(M, N, 3)``.
    """
    points = jnp.asarray(points)
    transform = jnp.asarray(transform)
    squeeze = transform.ndim == 2
    if squeeze:
        transform = transform[None]

    R = transform[..., :3, :3]  # (M, 3, 3)
    t = transform[..., :3, 3]  # (M, 3)
    # (M, 3, 3) @ (3, N) -> (M, 3, N) -> (M, N, 3); rides the MXU.
    out = jnp.einsum("mij,nj->mni", R, points) + t[:, None, :]
    if squeeze:
        out = out[0]
    return out
