"""Occupancy-grid pose registration (single object).

TPU-native equivalent of ``morefusion/contrib/occupancy_registration.py``:
(quaternion, translation) parameters optimized by Adam (translation LR
x0.1, reference ``:99-101``) against the differentiable soft occupancy
grid: reward intersection with the occupied target grid, penalize
intersection with known-free/unknown space. The reference's Python loop of
``loss.backward(); optimizer.update()`` becomes one jit ``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..functions.occupancy import occupancy_grid_3d
from ..functions.transforms import transformation_matrix, transform_points
from ..geometry.transform import (
    quaternion_from_matrix,
    translation_from_matrix,
)


def occupancy_registration_loss(
    quaternion,
    translation,
    points_source,
    grid_target,  # (2or3, X, Y, Z): [occupied, empty(, unknown)]
    *,
    pitch,
    origin,
    threshold,
):
    """-reward + penalty from the soft-occupancy overlap (ref ``:23-60``)."""
    T = transformation_matrix(quaternion, translation)
    moved = transform_points(points_source, T)
    grid_source = occupancy_grid_3d(
        moved,
        pitch=pitch,
        origin=origin,
        dims=grid_target.shape[1:],
        threshold=threshold,
    )

    occupied_target = grid_target[0]
    reward = jnp.sum(occupied_target * grid_source) / jnp.maximum(
        jnp.sum(occupied_target), 1e-16
    )

    if grid_target.shape[0] == 3:
        unoccupied = jnp.maximum(grid_target[1], grid_target[2])
    else:
        unoccupied = grid_target[1]
    penalty = jnp.sum(unoccupied * grid_source) / jnp.maximum(
        jnp.sum(grid_source), 1e-16
    )
    return penalty - reward


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "iterations", "alpha", "trajectory"),
)
def register_occupancy(
    points_source,
    grid_target,
    quaternion_init,
    translation_init,
    *,
    pitch,
    origin,
    threshold=2.0,
    iterations: int = 100,
    alpha: float = 0.1,
    trajectory: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Adam loop; returns (quaternion, translation, losses).

    With ``trajectory=True`` the quaternion/translation outputs carry the
    full per-iteration history ``(iterations, 4)`` / ``(iterations, 3)``
    of one continuous optimization (one compile, one device program) —
    this backs ``register_iterative``'s step-by-step yielding.
    """
    params = {
        "quaternion": jnp.asarray(quaternion_init, jnp.float32),
        "translation": jnp.asarray(translation_init, jnp.float32),
    }
    # translation learning rate x0.1 (reference :99-101)
    tx = optax.multi_transform(
        {
            "q": optax.adam(alpha),
            "t": optax.adam(alpha * 0.1),
        },
        {"quaternion": "q", "translation": "t"},
    )
    opt_state = tx.init(params)

    def loss_fn(p):
        return occupancy_registration_loss(
            p["quaternion"],
            p["translation"],
            points_source,
            grid_target,
            pitch=pitch,
            origin=origin,
            threshold=threshold,
        )

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        out = (params, loss) if trajectory else loss
        return (params, opt_state), out

    (params, _), outs = jax.lax.scan(
        step, (params, opt_state), None, length=iterations
    )
    if trajectory:
        traj, losses = outs
        return traj["quaternion"], traj["translation"], losses
    return params["quaternion"], params["translation"], outs


class OccupancyRegistration:
    """Reference-compatible wrapper around the jit scan loop."""

    def __init__(
        self,
        points_source,
        grid_target,
        *,
        pitch,
        origin,
        threshold,
        transform_init,
        alpha=0.1,
    ):
        self._points = np.asarray(points_source, np.float32)
        self._grid = np.asarray(grid_target, np.float32)
        self._pitch = float(pitch)
        self._origin = np.asarray(origin, np.float32)
        self._threshold = float(threshold)
        self._alpha = float(alpha)
        self._q = quaternion_from_matrix(transform_init).astype(np.float32)
        self._t = translation_from_matrix(transform_init).astype(np.float32)

    @property
    def _transform(self):
        from ..geometry.transform import quaternion_matrix_np

        T = quaternion_matrix_np(self._q)
        T[:3, 3] = self._t
        return T

    def register(self, iteration=None):
        iteration = 100 if iteration is None else int(iteration)
        q, t, _ = register_occupancy(
            jnp.asarray(self._points),
            jnp.asarray(self._grid),
            self._q,
            self._t,
            pitch=self._pitch,
            origin=jnp.asarray(self._origin),
            threshold=self._threshold,
            iterations=iteration,
            alpha=self._alpha,
        )
        self._q = np.asarray(q)
        self._t = np.asarray(t)
        return self._transform

    def register_iterative(self, iteration=None):
        """Yield the transform after each iteration of ONE continuous
        optimization (reference ``occupancy_registration.py`` yields the
        refiner's intermediate states; re-running ``register(1)`` per
        step would reset Adam's moments every yield and oscillate)."""
        iteration = 100 if iteration is None else int(iteration)
        yield self._transform
        qs, ts, _ = register_occupancy(
            jnp.asarray(self._points),
            jnp.asarray(self._grid),
            self._q,
            self._t,
            pitch=self._pitch,
            origin=jnp.asarray(self._origin),
            threshold=self._threshold,
            iterations=iteration,
            alpha=self._alpha,
            trajectory=True,
        )
        qs, ts = np.asarray(qs), np.asarray(ts)
        for k in range(iteration):
            self._q, self._t = qs[k], ts[k]
            yield self._transform
