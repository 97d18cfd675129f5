"""Point-cloud registration: closed-form ICP + gradient ICP.

TPU-native replacements for the reference's registration stack:

- ``ICPRegistration`` (reference ``contrib/icp_registration.py:6-71``,
  Open3D point-to-point ICP): reimplemented as a jit-compiled ``lax.scan``
  of (MXU nearest-neighbor matmul -> masked Kabsch/SVD alignment) steps.
  Entirely on-device, fixed iteration count, distance-gated
  correspondences (max distance = 2 x voxel size, Open3D's default).
- ``IterativeClosestPointLink`` equivalent (``contrib/
  iterative_closest_point_link.py:9-44``): (quaternion, translation)
  parameters optimized by Adam on the gated sum-of-squares correspondence
  loss — the reference's outer Python Adam loop becomes one ``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..functions.knn import pairwise_sq_dist
from ..functions.transforms import transformation_matrix, transform_points


def _masked_kabsch(src, dst, weights):
    """Rigid (R, t) minimizing sum w_i ||R src_i + t - dst_i||^2.

    Uses Horn's quaternion method (dominant eigenvector of the 4x4
    correlation form, found by shifted power iteration) instead of a 3x3
    SVD: ``jnp.linalg.svd`` inside the per-iteration ``lax.scan`` compiles
    an iterative eigensolver whose XLA build takes minutes per shape via a
    remote compiler; the power iteration is a handful of 4x4 matmuls,
    branch-free, and handles reflection cases correctly (it always
    returns a proper rotation).
    """
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    S = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)  # (3, 3)

    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ],
        dtype=S.dtype,
    )
    # shift so the largest-eigenvalue direction dominates power iteration
    shift = 2.0 * jnp.sqrt(jnp.sum(S * S)) + 1e-12
    M = N + shift * jnp.eye(4, dtype=S.dtype)

    def power_step(q, _):
        q = M @ q
        return q / jnp.maximum(jnp.linalg.norm(q), 1e-20), None

    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=S.dtype)
    q, _ = jax.lax.scan(power_step, q0, None, length=30)

    from ..functions.transforms import quaternion_matrix

    R = quaternion_matrix(q)[:3, :3]
    t = mu_d - R @ mu_s
    return R, t


@functools.partial(jax.jit, static_argnames=("iterations",))
def icp_point_to_point(
    source: jnp.ndarray,
    target: jnp.ndarray,
    T_init: jnp.ndarray,
    max_correspondence_distance: float = 0.02,
    iterations: int = 100,
) -> jnp.ndarray:
    """Align ``source`` onto ``target``; returns T with target ~= T @ source.

    Args:
      source: (N, 3) e.g. CAD points.
      target: (M, 3) e.g. depth points.
      T_init: (4, 4) initial source -> target transform.
    """
    thresh_sq = max_correspondence_distance**2

    def step(T, _):
        moved = source @ T[:3, :3].T + T[:3, 3]  # (N, 3)
        d = pairwise_sq_dist(moved, target)  # (N, M)
        nn_idx = jnp.argmin(d, axis=1)
        nn_d = jnp.take_along_axis(d, nn_idx[:, None], axis=1)[:, 0]
        w = (nn_d < thresh_sq).astype(moved.dtype)
        R, t = _masked_kabsch(moved, target[nn_idx], w)
        delta = jnp.eye(4, dtype=T.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        return delta @ T, None

    T, _ = jax.lax.scan(step, T_init.astype(jnp.float32), None, length=iterations)
    return T


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def icp_point_to_point_gated(
    source: jnp.ndarray,
    target: jnp.ndarray,
    T_init: jnp.ndarray,
    max_correspondence_distance: float = 0.02,
    max_iterations: int = 100,
    rel_tol: float = 5e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convergence-gated ICP: ``lax.while_loop`` that stops when the inlier
    RMSE stops improving (Open3D's ``relative_rmse`` criterion shape)
    instead of always burning ``max_iterations`` scan steps.

    Default ``rel_tol`` is coarser than Open3D's 1e-6: point-to-point ICP
    has a long ~0.5%-per-iteration tail whose RMSE gains are micrometers —
    irrelevant against the 2 cm ADD serving thresholds
    (``runtime/object_mapping`` spawn gates), so serving stops there.

    Same per-step math as ``icp_point_to_point``; the serving path
    (``runtime/pipeline.py``) uses this variant — typical convergence is
    10-30 iterations, a 3-10x step-count cut at equal accuracy.

    Returns (T (4, 4), n_iterations ()).
    """
    thresh_sq = max_correspondence_distance**2

    def body(carry):
        T, i, prev1, prev2, _ = carry
        moved = source @ T[:3, :3].T + T[:3, 3]
        d = pairwise_sq_dist(moved, target)
        nn_idx = jnp.argmin(d, axis=1)
        nn_d = jnp.take_along_axis(d, nn_idx[:, None], axis=1)[:, 0]
        w = (nn_d < thresh_sq).astype(moved.dtype)
        rmse = jnp.sqrt(
            jnp.sum(nn_d * w) / jnp.maximum(jnp.sum(w), 1.0)
        )
        R, t = _masked_kabsch(moved, target[nn_idx], w)
        delta = jnp.eye(4, dtype=T.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        # Converged when the RMSE stops improving relative to the last OR
        # the second-to-last iteration: point-to-point ICP commonly lands
        # in a period-2 limit cycle (correspondence flip-flop between two
        # poses) where successive deltas stay large but rmse(i) ==
        # rmse(i-2). Absolute floors cover the perfect-fit case where rmse
        # sits at the float32 noise floor and relative tests never fire.
        thresh = rel_tol * jnp.minimum(rmse, 1e6) + 2e-7
        converged = (
            (rmse < 1e-6)
            | (jnp.abs(prev1 - rmse) < thresh)
            | (jnp.abs(prev2 - rmse) < thresh)
        )
        return delta @ T, i + 1, rmse, prev1, converged

    def cond(carry):
        _, i, _, _, converged = carry
        return (i < max_iterations) & ~converged

    T, n, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            T_init.astype(jnp.float32),
            jnp.int32(0),
            jnp.float32(jnp.inf),
            jnp.float32(jnp.inf),
            jnp.bool_(False),
        ),
    )
    return T, n


class ICPRegistration:
    """Reference-compatible wrapper (depth cloud vs. CAD cloud).

    The reference feeds Open3D ``source=depth, target=cad`` with inverted
    initial transform and re-inverts the result
    (``icp_registration.py:30-46``); the net effect is refining
    ``T_cad2cam``. We do the same with the scan ICP.
    """

    def __init__(self, pcd_depth, pcd_cad, transform_init=None):
        from ..geometry.pointcloud import voxel_down_sample

        self._pcd_depth = np.asarray(pcd_depth)
        self._pcd_cad = np.asarray(pcd_cad)
        self._transform = (
            np.eye(4) if transform_init is None else np.asarray(transform_init)
        )
        self._down = voxel_down_sample

    @staticmethod
    def _pad_bucket(points: np.ndarray, sign: float) -> np.ndarray:
        """Pad to the next power-of-two bucket with far-away sentinels.

        Variable point counts would trigger one XLA compile per example
        (fatal with a remote compiler); sentinel points sit ~1e6 m out, so
        they are never the nearest neighbor of a real point and never pass
        the correspondence gate. Source and target use opposite signs so
        sentinel-to-sentinel pairs are also ~2e6 m apart.
        """
        n = len(points)
        bucket = max(256, 1 << int(np.ceil(np.log2(max(n, 1)))))
        if n == bucket:
            return points
        pad = np.full((bucket - n, 3), sign * 1e6, dtype=points.dtype)
        # spread sentinels so they are also far from each other
        pad += np.arange(bucket - n, dtype=points.dtype)[:, None] * 1e3
        return np.concatenate([points, pad])

    def _prepared(self, voxel_size):
        cad = self._pad_bucket(
            self._down(self._pcd_cad, voxel_size).astype(np.float32), 1.0
        )
        depth = self._pad_bucket(
            self._down(self._pcd_depth, voxel_size).astype(np.float32), -1.0
        )
        return jnp.asarray(depth), jnp.asarray(cad)

    def register(self, iteration=None, voxel_size=None) -> np.ndarray:
        iteration = 100 if iteration is None else iteration
        voxel_size = 0.01 if voxel_size is None else voxel_size
        depth, cad = self._prepared(voxel_size)
        # Align source=depth onto target=cad (the reference's direction,
        # ``icp_registration.py:33-46``): every *observed* point has a true
        # correspondence on the model, whereas matching from the CAD side
        # lets the unobserved back surface drag the fit. The initial guess
        # is therefore inverse(T_cad2cam), and the result is re-inverted.
        # Convergence-gated: stops at Open3D's relative-RMSE criterion
        # instead of running the full fixed iteration budget.
        T_depth2cad, self.last_n_iterations = icp_point_to_point_gated(
            depth,
            cad,
            jnp.asarray(
                np.linalg.inv(self._transform), dtype=jnp.float32
            ),
            max_correspondence_distance=2 * voxel_size,
            max_iterations=int(iteration),
        )
        self._transform = np.linalg.inv(
            np.asarray(T_depth2cad, dtype=np.float64)
        )
        return self._transform

    def register_iterative(self, iteration=None, voxel_size=None):
        """Step-yielding variant (demo playback).

        jit-stable: the downsample + bucket padding happen once and every
        yielded step reuses one cached single-iteration executable
        (previously each step re-entered ``register`` and re-prepared the
        clouds).
        """
        iteration = 100 if iteration is None else iteration
        voxel_size = 0.01 if voxel_size is None else voxel_size
        depth, cad = self._prepared(voxel_size)
        max_d = 2 * voxel_size
        yield self._transform
        for _ in range(iteration):
            T_depth2cad = icp_point_to_point(
                depth,
                cad,
                jnp.asarray(
                    np.linalg.inv(self._transform), dtype=jnp.float32
                ),
                max_correspondence_distance=max_d,
                iterations=1,
            )
            self._transform = np.linalg.inv(
                np.asarray(T_depth2cad, dtype=np.float64)
            )
            yield self._transform


@functools.partial(jax.jit, static_argnames=("iterations",))
def gradient_icp(
    source: jnp.ndarray,
    target: jnp.ndarray,
    quaternion_init: jnp.ndarray,
    translation_init: jnp.ndarray,
    learning_rate: float = 0.01,
    gate: float = 0.02,
    iterations: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Adam on (quaternion, translation) with gated correspondence loss.

    Reference semantics (``iterative_closest_point_link.py:28-44``): for
    each *target* (depth) point find the nearest transformed source point;
    keep pairs with squared distance < gate; loss = sum of squared
    distances.

    Returns (quaternion, translation, losses (iterations,)).
    """

    params = {
        "quaternion": quaternion_init.astype(jnp.float32),
        "translation": translation_init.astype(jnp.float32),
    }
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    def loss_fn(p):
        T = transformation_matrix(p["quaternion"], p["translation"])
        moved = transform_points(source, T)  # (N, 3)
        d = pairwise_sq_dist(target, jax.lax.stop_gradient(moved))  # (M, N)
        corr = jnp.argmin(d, axis=1)
        matched = moved[corr]  # differentiable gather
        sq = jnp.sum((matched - target) ** 2, axis=1)
        keep = jax.lax.stop_gradient(sq) < gate
        return jnp.sum(jnp.where(keep, sq, 0.0))

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), None, length=iterations
    )
    return params["quaternion"], params["translation"], losses
