"""Joint multi-object collision-based pose refinement (ICC).

TPU-native redesign of the paper's joint refiner
(``morefusion/contrib/iterative_collision_check_link.py:9-99`` and its ROS
driver ``collision_based_pose_refinement.py:48-233``):

- all N objects' poses are one parameter tensor; per-object pseudo-
  occupancy grids are built with ``vmap`` instead of Python loops;
- the reference's "concatenate all other objects' points" step
  (``:65-85``) becomes a masked all-objects voxelization per target frame
  (the (i, j) pair interaction is one batched segment-min over N x N*M
  candidates — no host loop, no dynamic shapes);
- the Adam loop (alpha 0.01, translation LR x0.1, <=30 iterations with the
  ROS node's plateau early-stop: window of 10 |dloss|, threshold 0.009,
  3 consecutive passes) runs entirely in-graph via ``lax.scan`` with a
  freeze mask, so one compiled program serves any convergence pattern.

Loss (reference ``:91-98``): ``penalty - reward`` with
  reward  = sum(grid_surface * grid_target) / sum(grid_target)
  penalty = sum(grid_inside * grid_nontarget_empty') / sum(grid_inside)
where ``grid_nontarget_empty'`` includes other objects' inside-grids.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..functions.tdf import pseudo_occupancy_voxelization
from ..functions.transforms import transformation_matrix, transform_points

def _upsample_axis_np(a, scale, axis):
    V = a.shape[axis]
    pos = np.arange(V * scale, dtype=np.float64) / scale
    i0 = np.floor(pos).astype(np.int64)
    w = (pos - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, V - 1)
    a0 = np.take(a, i0, axis=axis)
    a1 = np.take(a, i1, axis=axis)
    shape = [1] * a.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return a0 * (1.0 - w) + a1 * w


def upsample_observed_grid(grid, scale: int):
    """Trilinear upsample of an observed occupancy grid to a finer pitch.

    Voxel center of index ``k`` sits at ``origin + k * pitch`` (the
    convention of :func:`_resample_grid` and the voxelizers), so the
    refined grid keeps the SAME origin with ``pitch' = pitch / scale``
    and ``V' = V * scale`` — even fine indices land exactly on original
    centers.  Purpose: refinement-time grids finer than the model's 32^3
    training pitch (ROUND4.md §2b measured the ICC reward basin at one
    voxel-blur ~= threshold x pitch ~= 12 mm while median position error
    is ~11 mm; the reference likewise scales refinement pitches per
    class, ``ros/.../utils/data.h:9-37``, independent of the CNN grid).
    """
    g = np.asarray(grid, np.float32)
    if scale == 1:
        return g
    for ax in (-3, -2, -1):
        g = _upsample_axis_np(g, scale, ax)
    return g


def _axis_weights(o_i, pitch_i, o_j, pitch_j, V, dtype):
    """(V_out, V_src) trilinear hat weights for one axis of the axis-
    aligned scale-translate resample. Out-of-range rows are all-zero
    (matching out-of-bounds -> 0 of a gather-based trilinear sample)."""
    out_idx = jnp.arange(V, dtype=dtype)
    src = (o_i + out_idx * pitch_i - o_j) / pitch_j  # (V,)
    d = jnp.abs(src[:, None] - jnp.arange(V, dtype=dtype)[None, :])
    return jnp.clip(1.0 - d, 0.0, 1.0)


def _resample_grid(grid_j, pitch_j, origin_j, pitch_i, origin_i, voxel_dim):
    """Trilinearly sample object j's grid at frame i's voxel centers.

    Both grids are axis-aligned, so the trilinear resample factorizes into
    three separable 1-D interpolations — three tiny (V, V) matmuls instead
    of V^3 x 8 gathers (TPU gathers would dominate the whole refiner).
    Differentiable w.r.t. grid_j (and through it, the points).
    """
    V = voxel_dim
    dt = grid_j.dtype
    wx = _axis_weights(origin_i[0], pitch_i, origin_j[0], pitch_j, V, dt)
    wy = _axis_weights(origin_i[1], pitch_i, origin_j[1], pitch_j, V, dt)
    wz = _axis_weights(origin_i[2], pitch_i, origin_j[2], pitch_j, V, dt)
    g = jnp.einsum("ai,ijk->ajk", wx, grid_j)
    g = jnp.einsum("bj,ajk->abk", wy, g)
    return jnp.einsum("ck,abk->abc", wz, g)


def icc_loss(
    quaternions,  # (N, 4)
    translations,  # (N, 3)
    points,  # (N, M, 3) solid CAD points (padded)
    sdf,  # (N, M) inside-positive distances
    point_mask,  # (N, M) bool
    pitch,  # (N,)
    origin,  # (N, 3)
    grid_target,  # (N, V, V, V)
    grid_nontarget_empty,  # (N, V, V, V)
    obj_mask,  # (N,) bool — padded object slots
    *,
    voxel_dim: int = 32,
    threshold: float = 2.0,
    sdf_offset: float = 0.0,
    cross_mode: str = "resample",
    return_parts: bool = False,
):
    """ICC loss. ``cross_mode``:

    - ``"resample"`` (default, TPU-fast): each object's inside-grid is
      voxelized once in its own frame; other-object occupancy in frame i
      comes from trilinearly resampling frame j's grid (an axis-aligned
      scale-translate). O(N*M*V + N^2*V) instead of O(N^2*M*V) — this is
      what makes >=100 joint-refinement iters/s possible. Deviation from
      the reference: inside-weights are normalized per object rather than
      over the union of the other objects' points.
    - ``"exact"``: the reference formulation — voxelize the union of all
      j != i points into frame i (shared max-normalization).
    """
    N, M, _ = points.shape
    dims = (voxel_dim,) * 3

    T = transformation_matrix(quaternions, translations)  # (N, 4, 4)
    moved = jax.vmap(transform_points)(points, T)  # (N, M, 3)
    valid = point_mask & obj_mask[:, None]

    # own grids, all objects in one batched call (the Pallas min-distance
    # kernel takes an explicit batch grid — no vmap)
    grid_u, grid_s, grid_i = pseudo_occupancy_voxelization(
        moved,
        sdf,
        pitch=pitch,
        origin=origin,
        dims=dims,
        threshold=threshold,
        sdf_offset=sdf_offset,
        point_mask=valid,
    )

    if cross_mode == "resample":
        # grid_other[i] = max_{j != i} resample(grid_inside[j] -> frame i)
        def pair(i, j):
            g = _resample_grid(
                grid_i[j], pitch[j], origin[j], pitch[i], origin[i],
                voxel_dim,
            )
            keep = (i != j) & obj_mask[j]
            return jnp.where(keep, g, 0.0)

        iidx, jidx = jnp.meshgrid(
            jnp.arange(N), jnp.arange(N), indexing="ij"
        )
        pair_grids = jax.vmap(pair)(
            iidx.reshape(-1), jidx.reshape(-1)
        ).reshape(N, N, *dims)
        grid_other = jnp.max(pair_grids, axis=1)
    elif cross_mode == "exact":
        # voxelize ALL objects' points except i into frame i (matches the
        # reference's concat of j != i points, including the shared
        # max-normalization of the inside weights).
        flat_pts = jnp.broadcast_to(
            moved.reshape(1, N * M, 3), (N, N * M, 3)
        )
        flat_sdf = jnp.broadcast_to(sdf.reshape(1, N * M), (N, N * M))
        owner = jnp.repeat(jnp.arange(N), M)  # (N*M,)
        others_mask = valid.reshape(1, N * M) & (
            owner[None, :] != jnp.arange(N)[:, None]
        )  # (N, N*M)
        _, _, grid_other = pseudo_occupancy_voxelization(
            flat_pts,
            flat_sdf,
            pitch=pitch,
            origin=origin,
            dims=dims,
            threshold=threshold,
            point_mask=others_mask,
        )
    else:
        raise ValueError(f"unknown cross_mode: {cross_mode}")
    gne = jnp.maximum(grid_nontarget_empty, grid_other)

    om = obj_mask[:, None, None, None]
    grid_s = jnp.where(om, grid_s, 0.0)
    grid_i = jnp.where(om, grid_i, 0.0)
    g_t = jnp.where(om, grid_target, 0.0)

    reward = jnp.sum(grid_s * g_t) / jnp.maximum(jnp.sum(g_t), 1e-16)
    penalty = jnp.sum(grid_i * gne) / jnp.maximum(jnp.sum(grid_i), 1e-16)
    if return_parts:
        # per-object components (diagnostics: examples/icc_diagnose.py)
        ax = (1, 2, 3)
        reward_i = jnp.sum(grid_s * g_t, ax) / jnp.maximum(
            jnp.sum(g_t, ax), 1e-16
        )
        penalty_i = jnp.sum(grid_i * gne, ax) / jnp.maximum(
            jnp.sum(grid_i, ax), 1e-16
        )
        return penalty - reward, (penalty_i, reward_i)
    return penalty - reward


@functools.partial(
    jax.jit,
    static_argnames=(
        "voxel_dim", "threshold", "sdf_offset", "iterations", "alpha",
        "early_stop", "cross_mode", "alpha_decay",
    ),
)
def refine_collision(
    quaternions,
    translations,
    points,
    sdf,
    point_mask,
    pitch,
    origin,
    grid_target,
    grid_nontarget_empty,
    obj_mask=None,
    *,
    voxel_dim: int = 32,
    threshold: float = 2.0,
    sdf_offset: float = 0.0,
    iterations: int = 30,
    alpha: float = 0.01,
    early_stop: bool = True,
    cross_mode: str = "resample",
    alpha_decay: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jointly refine all object poses.

    Returns (quaternions, translations, losses (iterations,),
    n_effective_iterations). With ``early_stop``, iterations after the
    plateau condition fires keep the parameters frozen (same compiled
    program for every convergence pattern).

    Divergences from the reference optimizer (both measured on the
    perturbation-recovery probe, ROUND4.md §2b):

    - the returned pose is the BEST-loss iterate of the whole
      trajectory, not the last one (the reference's fixed-alpha Adam
      oscillates on the piecewise-smooth voxel objective and its last
      iterate can be *worse* than the initialization; best-iterate
      makes refinement monotone-safe by construction);
    - ``alpha_decay=True`` applies a cosine schedule alpha -> 0 over
      the ``iterations`` budget so long offline runs settle instead of
      bouncing (the reference's 30-step streaming calls never ran long
      enough to need this).
    """
    N = quaternions.shape[0]
    if obj_mask is None:
        obj_mask = jnp.ones((N,), bool)

    # grids may arrive quantized to uint8 (serving pipeline: 4x fewer
    # bytes through the host->device link); dequantize in-graph
    if grid_target.dtype == jnp.uint8:
        grid_target = grid_target.astype(jnp.float32) * (1.0 / 255.0)
    if grid_nontarget_empty.dtype == jnp.uint8:
        grid_nontarget_empty = (
            grid_nontarget_empty.astype(jnp.float32) * (1.0 / 255.0)
        )

    params = {
        "quaternion": jnp.asarray(quaternions, jnp.float32),
        "translation": jnp.asarray(translations, jnp.float32),
    }
    if alpha_decay:
        lr_q = optax.cosine_decay_schedule(alpha, iterations)
        lr_t = optax.cosine_decay_schedule(alpha * 0.1, iterations)
    else:
        lr_q, lr_t = alpha, alpha * 0.1
    tx = optax.multi_transform(
        {"q": optax.adam(lr_q), "t": optax.adam(lr_t)},
        {"quaternion": "q", "translation": "t"},
    )
    opt_state = tx.init(params)

    def loss_fn(p):
        return icc_loss(
            p["quaternion"],
            p["translation"],
            points,
            sdf,
            point_mask,
            pitch,
            origin,
            grid_target,
            grid_nontarget_empty,
            obj_mask,
            voxel_dim=voxel_dim,
            threshold=threshold,
            sdf_offset=sdf_offset,
            cross_mode=cross_mode,
        )

    # plateau observer state (ROS node LossObserver, :18-45): deque of the
    # last 10 |delta loss|; stop after 3 consecutive iterations whose
    # max-delta < 0.009.
    deltas0 = jnp.full((10,), jnp.inf, jnp.float32)

    def step(carry, _):
        (
            params, opt_state, last, deltas, n_passed, stopped, n_iter,
            best_loss, best_params,
        ) = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # best-iterate tracking: `loss` is evaluated at `params`
        better = loss < best_loss
        best_params = jax.tree_util.tree_map(
            lambda cur, best: jnp.where(better, cur, best),
            params,
            best_params,
        )
        best_loss = jnp.where(better, loss, best_loss)

        deltas = jnp.roll(deltas, -1).at[-1].set(jnp.abs(last - loss))
        max_delta = jnp.max(deltas)
        n_passed = jnp.where(max_delta < 0.009, n_passed + 1, 0)
        stop_now = early_stop & (n_passed >= 3)

        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, b, a), new, old
        )
        params = keep(new_params, params)
        opt_state = keep(opt_state2, opt_state)
        n_iter = n_iter + jnp.where(stopped, 0, 1)
        stopped = stopped | stop_now
        return (
            params, opt_state, loss, deltas, n_passed, stopped, n_iter,
            best_loss, best_params,
        ), loss

    init = (
        params,
        opt_state,
        jnp.asarray(jnp.inf, jnp.float32),
        deltas0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, jnp.float32),
        params,
    )
    (
        _, _, _, _, _, _, n_iter, _, best_params
    ), losses = jax.lax.scan(step, init, None, length=iterations)
    return (
        best_params["quaternion"],
        best_params["translation"],
        losses,
        n_iter,
    )


class IterativeCollisionCheck:
    """Host-friendly wrapper: build padded arrays from per-object lists."""

    def __init__(
        self,
        transforms,  # list of (4, 4) initial poses
        points,  # list of (M_i, 3) solid points
        sdf,  # list of (M_i,)
        pitch,  # list/array of float
        origin,  # list of (3,)
        grid_target,  # (N, V, V, V)
        grid_nontarget_empty,  # (N, V, V, V)
        voxel_dim: int = 32,
        threshold: float = 2.0,
        sdf_offset: float = 0.0,
        max_points: Optional[int] = None,
        cross_mode: str = "resample",
        pad_objects: bool = True,
    ):
        from ..geometry.transform import (
            quaternion_from_matrix,
            translation_from_matrix,
        )

        N = len(transforms)
        # pad the object axis to a power-of-two bucket so a serving loop
        # with a varying live-object count reuses one compiled refine per
        # bucket instead of recompiling the 30-iteration scan per N
        # (padded slots are masked out of the loss via obj_mask)
        Np = 1 << (N - 1).bit_length() if pad_objects and N > 0 else N
        self._n = N
        self._obj_mask = np.zeros((Np,), bool)
        self._obj_mask[:N] = True
        M = max_points or max(len(p) for p in points)
        self._q = np.tile(
            np.array([1, 0, 0, 0], np.float32), (Np, 1)
        )
        self._q[:N] = np.stack(
            [quaternion_from_matrix(T) for T in transforms]
        ).astype(np.float32)
        self._t = np.zeros((Np, 3), np.float32)
        self._t[:N] = np.stack(
            [translation_from_matrix(T) for T in transforms]
        ).astype(np.float32)
        self._points = np.zeros((Np, M, 3), np.float32)
        self._sdf = np.zeros((Np, M), np.float32)
        self._mask = np.zeros((Np, M), bool)
        for i, (p, s) in enumerate(zip(points, sdf)):
            k = min(len(p), M)
            if len(p) > M:
                keep = np.random.RandomState(i).permutation(len(p))[:M]
                p, s = p[keep], s[keep]
            self._points[i, :k] = p[:k]
            self._sdf[i, :k] = s[:k]
            self._mask[i, :k] = True
        self._pitch = np.ones((Np,), np.float32)
        self._pitch[:N] = np.asarray(pitch, np.float32)
        self._origin = np.zeros((Np, 3), np.float32)
        self._origin[:N] = np.asarray(origin, np.float32)
        grid_target = np.asarray(grid_target)
        grid_nontarget_empty = np.asarray(grid_nontarget_empty)
        V = grid_target.shape[-1]
        # uint8-quantized grids stay uint8 through the host->device
        # transfer; refine_collision dequantizes in-graph
        gt_dtype = (
            np.uint8 if grid_target.dtype == np.uint8 else np.float32
        )
        gn_dtype = (
            np.uint8
            if grid_nontarget_empty.dtype == np.uint8
            else np.float32
        )
        self._grid_target = np.zeros((Np, V, V, V), gt_dtype)
        self._grid_target[:N] = grid_target.astype(gt_dtype)
        self._gne = np.zeros((Np, V, V, V), gn_dtype)
        self._gne[:N] = grid_nontarget_empty.astype(gn_dtype)
        self._voxel_dim = voxel_dim
        self._threshold = threshold
        self._sdf_offset = sdf_offset
        self._cross_mode = cross_mode

    def refine_async(
        self,
        iterations: int = 30,
        alpha: float = 0.01,
        early_stop: bool = True,
        alpha_decay: bool = False,
    ):
        """Dispatch the refinement without blocking on the result.

        Returns immediately after enqueueing the compiled program; call
        :meth:`resolve` to read the result back. This mirrors the
        reference's node graph, where collision refinement is its own ROS
        node consuming the pose stream asynchronously
        (``collision_based_pose_refinement.py:108-211``) — the serving
        pipeline overlaps the refine of frame k with the host work of
        frame k+1 and only pays the device->host round trip once the
        result is actually needed.
        """
        self._pending = refine_collision(
            self._q,
            self._t,
            self._points,
            self._sdf,
            self._mask,
            self._pitch,
            self._origin,
            self._grid_target,
            self._gne,
            obj_mask=jnp.asarray(self._obj_mask),
            voxel_dim=self._voxel_dim,
            threshold=self._threshold,
            sdf_offset=self._sdf_offset,
            iterations=iterations,
            alpha=alpha,
            early_stop=early_stop,
            alpha_decay=alpha_decay,
            cross_mode=self._cross_mode,
        )

    def resolve(self):
        """Block on the pending :meth:`refine_async` dispatch."""
        # single device->host transfer for the whole result tuple (each
        # separate np.asarray is its own round trip)
        q, t, losses, n_iter = jax.device_get(self._pending)
        self._pending = None
        self._q = np.asarray(q)
        self._t = np.asarray(t)
        return self.transforms, np.asarray(losses), int(n_iter)

    def refine(
        self,
        iterations: int = 30,
        alpha: float = 0.01,
        early_stop: bool = True,
        alpha_decay: bool = False,
    ):
        self.refine_async(
            iterations=iterations,
            alpha=alpha,
            early_stop=early_stop,
            alpha_decay=alpha_decay,
        )
        return self.resolve()

    def loss_components(self, transforms=None):
        """Evaluate the ICC objective at the given (default: current)
        poses without refining. Returns ``(loss, penalty_i, reward_i)``
        with per-object components — the diagnostic probe behind
        ``examples/icc_diagnose.py`` (is the objective's minimum even at
        the ground-truth configuration on this data?)."""
        from ..geometry.transform import (
            quaternion_from_matrix,
            translation_from_matrix,
        )

        q, t = self._q, self._t
        if transforms is not None:
            q, t = q.copy(), t.copy()
            for i, T in enumerate(transforms[: self._n]):
                q[i] = quaternion_from_matrix(T)
                t[i] = translation_from_matrix(T)
        gt, gn = self._grid_target, self._gne
        if gt.dtype == np.uint8:
            gt = gt.astype(np.float32) / 255.0
        if gn.dtype == np.uint8:
            gn = gn.astype(np.float32) / 255.0
        loss, (pen, rew) = icc_loss(
            jnp.asarray(q),
            jnp.asarray(t),
            jnp.asarray(self._points),
            jnp.asarray(self._sdf),
            jnp.asarray(self._mask),
            jnp.asarray(self._pitch),
            jnp.asarray(self._origin),
            jnp.asarray(gt),
            jnp.asarray(gn),
            jnp.asarray(self._obj_mask),
            voxel_dim=self._voxel_dim,
            threshold=self._threshold,
            sdf_offset=self._sdf_offset,
            cross_mode=self._cross_mode,
            return_parts=True,
        )
        n = self._n
        return float(loss), np.asarray(pen)[:n], np.asarray(rew)[:n]

    @staticmethod
    def warmup_buckets(
        n_objects=(1, 2, 4, 8),
        voxel_dim: int = 32,
        max_points: int = 2048,
        iterations: int = 30,
        cross_mode: str = "resample",
    ):
        """Precompile the refine program for the given object-count
        buckets (serving: the first frame whose live-object count lands in
        a new power-of-two bucket otherwise pays a multi-second XLA
        compile in the frame loop)."""
        for n in n_objects:
            icc = IterativeCollisionCheck(
                [np.eye(4, dtype=np.float32)] * n,
                [np.zeros((8, 3), np.float32)] * n,
                [np.zeros((8,), np.float32)] * n,
                [0.01] * n,
                [np.zeros(3, np.float32)] * n,
                np.zeros((n, voxel_dim, voxel_dim, voxel_dim), np.uint8),
                np.zeros((n, voxel_dim, voxel_dim, voxel_dim), np.uint8),
                voxel_dim=voxel_dim,
                max_points=max_points,
                cross_mode=cross_mode,
            )
            icc.refine(iterations=iterations)

    @property
    def transforms(self):
        from ..geometry.transform import quaternion_matrix_np

        out = []
        for q, t in zip(self._q[: self._n], self._t[: self._n]):
            T = quaternion_matrix_np(q)
            T[:3, 3] = t
            out.append(T)
        return np.stack(out)
