"""Tests for morefusion_tpu.functions.transforms.

Mirrors the reference test strategy (SURVEY.md §4): random synthetic inputs,
NumPy-reference parity, and numerical gradient checks via
``jax.test_util.check_grads``.
"""

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial.transform

from morefusion_tpu import functions as F
from morefusion_tpu.geometry.transform import quaternion_matrix_np


def random_quaternions(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quaternion_matrix_matches_scipy(rng):
    q = random_quaternions(rng, 16)
    T = np.asarray(F.quaternion_matrix(q))
    # scipy uses (x, y, z, w) ordering.
    R_scipy = scipy.spatial.transform.Rotation.from_quat(
        q[:, [1, 2, 3, 0]]
    ).as_matrix()
    np.testing.assert_allclose(T[:, :3, :3], R_scipy, atol=1e-5)
    np.testing.assert_allclose(T[:, 3, :], np.tile([0, 0, 0, 1], (16, 1)), atol=0)


def test_quaternion_matrix_unnormalized_input(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32) * 3.0
    T1 = np.asarray(F.quaternion_matrix(q))
    T2 = np.asarray(F.quaternion_matrix(q / np.linalg.norm(q, axis=1, keepdims=True)))
    np.testing.assert_allclose(T1, T2, atol=1e-5)


def test_quaternion_matrix_single(rng):
    q = random_quaternions(rng, 1)[0]
    T = F.quaternion_matrix(q)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(
        np.asarray(T), quaternion_matrix_np(q), atol=1e-5
    )


def test_quaternion_matrix_grads(rng):
    q = random_quaternions(rng, 3).astype(np.float64)
    jax.test_util.check_grads(
        lambda x: F.quaternion_matrix(x), (q,), order=1, modes=["rev"], atol=1e-3, rtol=1e-3
    )


def test_compose_transform(rng):
    R = scipy.spatial.transform.Rotation.random(5, random_state=rng).as_matrix()
    t = rng.normal(size=(5, 3))
    T = np.asarray(F.compose_transform(R, t))
    assert T.shape == (5, 4, 4)
    np.testing.assert_allclose(T[:, :3, :3], R, atol=1e-6)
    np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-6)
    # single
    T0 = F.compose_transform(R[0], t[0])
    assert T0.shape == (4, 4)


def test_transformation_matrix_roundtrip(rng):
    q = random_quaternions(rng, 4)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    T = np.asarray(F.transformation_matrix(q, t))
    np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-6)
    for i in range(4):
        expected = quaternion_matrix_np(q[i])
        expected[:3, 3] = t[i]
        np.testing.assert_allclose(T[i], expected, atol=1e-5)


def test_translation_matrix(rng):
    t = rng.normal(size=(3,)).astype(np.float32)
    T = np.asarray(F.translation_matrix(t))
    expected = np.eye(4, dtype=np.float32)
    expected[:3, 3] = t
    np.testing.assert_allclose(T, expected, atol=1e-6)


def test_transform_points_single_and_batched(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    R = scipy.spatial.transform.Rotation.random(3, random_state=rng)
    T = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    T[:, :3, :3] = R.as_matrix()
    T[:, :3, 3] = rng.normal(size=(3, 3))

    out = np.asarray(F.transform_points(pts, T))
    assert out.shape == (3, 10, 3)
    for i in range(3):
        expected = pts @ T[i, :3, :3].T + T[i, :3, 3]
        np.testing.assert_allclose(out[i], expected, atol=1e-5)

    out0 = np.asarray(F.transform_points(pts, T[0]))
    assert out0.shape == (10, 3)
    np.testing.assert_allclose(out0, out[0], atol=1e-6)


def test_transform_points_grads(rng):
    pts = rng.normal(size=(5, 3))
    T = np.eye(4)
    jax.test_util.check_grads(
        lambda p, t: F.transform_points(p, t), (pts, T), order=1, modes=["rev"],
        atol=1e-3, rtol=1e-3,
    )
