"""Device-side augmentation: value-range, NaN, and identity properties.

Reference host augmentors being replaced:
``rgbd_pose_estimation/reindexed.py:39-75`` (RGB contrast/HSV/blur/resize,
PCD dropout + noise).
"""

import jax
import jax.numpy as jnp
import numpy as np

from morefusion_tpu.training import augment_device as A


def test_hsv_round_trip():
    rng = np.random.RandomState(0)
    rgb = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    back = np.asarray(A.hsv_to_rgb(A.rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_augment_rgb_range_and_shape():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    out = jax.jit(A.augment_rgb_device)(jax.random.PRNGKey(0), rgb)
    out = np.asarray(out)
    assert out.shape == rgb.shape
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 255.0
    # different per-example params: examples must differ from each other
    # after augmenting identical inputs
    same = np.stack([rgb[0]] * 3)
    out2 = np.asarray(
        jax.jit(A.augment_rgb_device)(jax.random.PRNGKey(1), same)
    )
    assert not np.allclose(out2[0], out2[1])


def test_augment_pcd_dropout_and_noise():
    rng = np.random.RandomState(2)
    pcd = rng.uniform(0.3, 0.8, (2, 32, 32, 3)).astype(np.float32)
    out = np.asarray(
        jax.jit(A.augment_pcd_device)(jax.random.PRNGKey(0), pcd)
    )
    nan_frac = np.isnan(out).any(axis=-1).mean()
    assert 0.01 < nan_frac < 0.12  # ~5% dropout
    ok = ~np.isnan(out).any(axis=-1)
    delta = np.abs(out[ok] - pcd[ok])
    assert delta.max() < 0.03  # sigma = 3 mm noise
    assert delta.mean() > 1e-4


def test_blur_delta_kernel_is_identity():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = np.asarray(A._blur_one(jnp.asarray(img), jnp.float32(1e-3)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_augment_batch_jits_under_grad():
    # must be differentiable-safe inside the train step's value_and_grad
    rgb = jnp.ones((1, 16, 16, 3), jnp.float32) * 128
    pcd = jnp.ones((1, 16, 16, 3), jnp.float32) * 0.5

    def f(scale):
        r, p = A.augment_batch(jax.random.PRNGKey(0), rgb * scale, pcd)
        return jnp.sum(r) + jnp.sum(jnp.where(jnp.isnan(p), 0.0, p))

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g))
