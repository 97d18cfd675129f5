"""Tests for KNN and the ADD/ADD-S loss (vs. the NumPy metric oracle)."""

import jax
import jax.test_util
import numpy as np
import pytest
import scipy.spatial.transform

from morefusion_tpu import functions as F
from morefusion_tpu import metrics


def test_nn_matches_bruteforce(rng):
    ref = rng.uniform(size=(100, 3)).astype(np.float32)
    query = rng.uniform(size=(250, 3)).astype(np.float32)
    idx = np.asarray(F.nn(ref, query))
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(axis=1))


def _random_pose(rng, scale_t=0.05):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = scipy.spatial.transform.Rotation.random(
        random_state=rng
    ).as_matrix()
    T[:3, 3] = rng.uniform(-scale_t, scale_t, 3)
    return T


def test_average_distance_matches_metric(rng):
    points = rng.uniform(-0.05, 0.05, (200, 3)).astype(np.float32)
    T_true = _random_pose(rng)
    T_pred = np.stack([_random_pose(rng) for _ in range(4)])

    add = np.asarray(F.average_distance(points, T_true, T_pred))
    add_np, adds_np = metrics.average_distance(
        [points] * 4, [T_true] * 4, list(T_pred)
    )
    np.testing.assert_allclose(add, add_np, atol=1e-4)

    add_s = np.asarray(
        F.average_distance(points, T_true, T_pred, symmetric=True)
    )
    # metric ADD-S queries pred->true per the loss convention:
    # loss: nn(ref=true, query=pred); metric: kdtree(points2=pred).query(true)
    # — directions differ, so compare against a direct oracle instead.
    pts_true = points @ T_true[:3, :3].T + T_true[:3, 3]
    for i in range(4):
        pts_pred = points @ T_pred[i, :3, :3].T + T_pred[i, :3, 3]
        d = np.sqrt(((pts_pred[:, None] - pts_true[None]) ** 2).sum(-1))
        expected = d.min(axis=1).mean()
        assert add_s[i] == pytest.approx(expected, abs=1e-4)
    assert np.all(add_s <= add + 1e-5)


def test_average_distance_zero_for_identical_pose(rng):
    points = rng.uniform(-0.05, 0.05, (50, 3)).astype(np.float32)
    T = _random_pose(rng)
    add = np.asarray(F.average_distance(points, T, T[None]))
    assert add[0] == pytest.approx(0.0, abs=1e-5)


def test_average_distance_grads(rng):
    points = rng.uniform(-0.05, 0.05, (20, 3))
    T_true = _random_pose(rng).astype(np.float64)
    T_pred = np.stack([_random_pose(rng) for _ in range(2)]).astype(np.float64)
    jax.test_util.check_grads(
        lambda tp: F.average_distance(points, T_true, tp).sum(),
        (T_pred,),
        order=1,
        modes=["rev"],
        atol=1e-3,
        rtol=1e-3,
    )


def test_densefusion_confidence_loss(rng):
    add = rng.uniform(0.0, 0.1, (100,)).astype(np.float32)
    conf = rng.uniform(0.01, 1.0, (100,)).astype(np.float32)
    loss = float(F.densefusion_confidence_loss(add, conf, 0.015))
    expected = np.mean(add * conf - 0.015 * np.log(conf))
    assert loss == pytest.approx(expected, abs=1e-5)

    # zero-confidence entries are masked out
    conf2 = conf.copy()
    conf2[:50] = 0.0
    loss2 = float(F.densefusion_confidence_loss(add, conf2, 0.015))
    expected2 = np.mean(add[50:] * conf2[50:] - 0.015 * np.log(conf2[50:]))
    assert loss2 == pytest.approx(expected2, abs=1e-5)
