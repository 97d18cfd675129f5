"""Fixed-shape masked point sampling (jit/vmap-friendly).

The reference samples 1000 valid (non-NaN) pixels per instance crop with a
per-sample Python loop on the host (``model.py:195-229``). Here the whole
batch is sampled on-device with static shapes:

- Gumbel-style trick: per-pixel uniform scores, invalid pixels pushed to
  -inf, ``top_k(n_point)`` -> a uniform random subset *without* replacement
  when enough valid pixels exist (matching the reference's
  ``permutation[:n_point]``).
- When fewer than ``n_point`` pixels are valid, the top-k returns all valid
  pixels first; the invalid tail is filled by cycling through the valid
  picks (matching the reference's arange + randint fill).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_point",))
def sample_mask_indices(mask: jnp.ndarray, key, n_point: int):
    """Sample ``n_point`` flat pixel indices per batch element.

    Args:
      mask: ``(B, H, W)`` bool validity mask.
      key: PRNG key.
      n_point: static sample count.

    Returns:
      ``(B, n_point)`` int32 flat indices into H*W. If a mask is entirely
      empty its indices are all zero (caller should treat such instances
      as invalid).
    """
    B, H, W = mask.shape
    flat = mask.reshape(B, H * W)

    scores = jax.random.uniform(key, (B, H * W))
    scores = jnp.where(flat, scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, n_point)  # (B, n_point), valid-first

    n_valid = jnp.sum(flat, axis=1)  # (B,)
    # Slot i >= n_valid picked an invalid pixel -> cycle back into the
    # valid prefix (i mod n_valid).
    slot = jnp.arange(n_point, dtype=jnp.int32)[None, :]
    nv = jnp.maximum(n_valid, 1)[:, None].astype(jnp.int32)
    wrapped = jnp.where(slot < nv, slot, slot % nv)
    idx = jnp.take_along_axis(idx, wrapped, axis=1)
    return idx.astype(jnp.int32)


def gather_pixels(image: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel vectors at flat indices.

    Args:
      image: ``(B, H, W, C)``.
      indices: ``(B, P)`` flat indices into H*W.

    Returns:
      ``(B, P, C)``.
    """
    B, H, W, C = image.shape
    flat = image.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, indices[..., None], axis=1)


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over the masked elements, batched.

    Args:
      values: ``(B, N, C)``.
      mask: ``(B, N)`` bool.

    Returns:
      ``(B, C)`` — the reference's ``extra.cupy.median`` over valid pixels
      (used for the voxel-grid origin, ``model.py:202-205``).
    """
    x = jnp.where(mask[..., None], values, jnp.nan)
    return jnp.nanmedian(x, axis=1)


def compute_origin(
    pcd: jnp.ndarray, mask: jnp.ndarray, pitch: jnp.ndarray, voxel_dim: int
) -> jnp.ndarray:
    """Voxel-grid origin so the masked-point median sits at the grid center.

    Reference: ``origin = center - pitch * (voxel_dim / 2 - 0.5)``
    (``model.py:202-205``).

    Args:
      pcd: ``(B, H, W, 3)`` (NaN = invalid).
      mask: ``(B, H, W)``.
      pitch: ``(B,)``.
    """
    B = pcd.shape[0]
    center = masked_median(pcd.reshape(B, -1, 3), mask.reshape(B, -1))
    return center - pitch[:, None] * (voxel_dim / 2.0 - 0.5)
