"""Device-side (jit-fused) training augmentation.

The reference augments on the host with imgaug/cv2 per example
(``rgbd_pose_estimation/reindexed.py:39-75``): RGB linear contrast, HSV
jitter, Gaussian blur, resolution degradation; PCD dropout + Gaussian
noise. On a TPU host with one usable core that work starves the device,
so this module reimplements the photometric/geometric noise stack as pure
jnp ops applied inside the train step — XLA fuses it into the forward
pass, making augmentation effectively free. Only the mask-truncation
augmentation (contour analysis, inherently sequential) stays on the host
(``augmentation.py:61-118``).

All randomness comes from ``jax.random`` with per-example parameter draws,
matching the reference's per-example augmentor semantics (not its RNG
stream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) float in [0, 1] -> HSV with H in [0, 1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _gauss_kernel(sigma, radius: int = 3):
    """(2r+1,) normalized Gaussian; degenerates to a delta as sigma -> 0."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sigma = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur_one(img, sigma, radius: int = 3):
    """Separable Gaussian blur of one (H, W, C) image, edge-padded."""
    H, W, C = img.shape
    k = _gauss_kernel(sigma, radius)
    conv_cols = jax.vmap(
        lambda c: jnp.convolve(c, k, mode="valid"), in_axes=1, out_axes=1
    )
    x = jnp.pad(img, ((radius, radius), (0, 0), (0, 0)), mode="edge")
    x = conv_cols(x.reshape(H + 2 * radius, W * C)).reshape(H, W, C)
    x = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    xt = x.transpose(1, 0, 2).reshape(W + 2 * radius, H * C)
    return conv_cols(xt).reshape(W, H, C).transpose(1, 0, 2)


# fixed scale set: per-example dynamic scale would be a dynamic shape;
# lax.switch over static resize branches keeps XLA happy
_SCALES = (0.25, 0.375, 0.5, 0.75, 1.0)


def _degrade_one(img, scale_idx):
    H, W, _ = img.shape

    def branch(s):
        def f(x):
            h, w = max(1, int(H * s)), max(1, int(W * s))
            small = jax.image.resize(x, (h, w, 3), method="linear")
            return jax.image.resize(small, (H, W, 3), method="linear")

        return f

    return jax.lax.switch(
        scale_idx, [branch(s) for s in _SCALES], img
    )


def augment_rgb_device(rng, rgb):
    """Per-example contrast + HSV jitter + blur + resolution degradation.

    Args:
      rgb: ``(B, H, W, 3)`` uint8-range (any dtype).
    Returns:
      ``(B, H, W, 3)`` float32 in [0, 255].
    """
    B = rgb.shape[0]
    k_con, k_h, k_s, k_v, k_sig, k_sc = jax.random.split(rng, 6)
    x = rgb.astype(jnp.float32) / 255.0

    # linear contrast (iaa.LinearContrast 0.8-1.2)
    alpha = jax.random.uniform(k_con, (B, 1, 1, 1), minval=0.8, maxval=1.2)
    x = jnp.clip((x - 0.5) * alpha + 0.5, 0.0, 1.0)

    # HSV jitter (H x0.95-1.05 wrap, S/V x0.8-1.2)
    hsv = rgb_to_hsv(x)
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=0.95, maxval=1.05)
    fs = jax.random.uniform(k_s, (B, 1, 1), minval=0.8, maxval=1.2)
    fv = jax.random.uniform(k_v, (B, 1, 1), minval=0.8, maxval=1.2)
    hsv = jnp.stack(
        [
            (hsv[..., 0] * fh) % 1.0,
            jnp.clip(hsv[..., 1] * fs, 0.0, 1.0),
            jnp.clip(hsv[..., 2] * fv, 0.0, 1.0),
        ],
        axis=-1,
    )
    x = hsv_to_rgb(hsv)

    # gaussian blur sigma U(0, 1); sigma < 0.1 ~ identity via delta kernel
    sigma = jax.random.uniform(k_sig, (B,), minval=0.0, maxval=1.0)
    sigma = jnp.where(sigma < 0.1, 1e-3, sigma)
    x = jax.vmap(_blur_one)(x, sigma)

    # resolution degradation: random scale from the fixed set
    scale_idx = jax.random.randint(k_sc, (B,), 0, len(_SCALES))
    x = jax.vmap(_degrade_one)(x, scale_idx)

    return (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.float32)


def augment_pcd_device(rng, pcd):
    """5% pixel dropout (-> NaN) + sigma=3 mm Gaussian noise."""
    k_drop, k_noise = jax.random.split(rng)
    drop = jax.random.bernoulli(k_drop, 0.05, pcd.shape[:3])
    noise = 0.003 * jax.random.normal(k_noise, pcd.shape, dtype=pcd.dtype)
    out = pcd + noise
    return jnp.where(drop[..., None], jnp.nan, out)


def augment_batch(rng, rgb, pcd):
    k_rgb, k_pcd = jax.random.split(rng)
    return (
        augment_rgb_device(k_rgb, rgb),
        augment_pcd_device(k_pcd, pcd),
    )
