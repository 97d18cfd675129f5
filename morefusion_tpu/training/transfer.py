"""Single-buffer batch transfer for a slow host->device link.

The training batch used to move to the device as ~10 separate
``device_put`` calls totalling ~16 MB (fp32 pcd alone is 12 MB). This
container's TPU relay measures ~24 MB/s H2D with ~2 ms/call latency and
~30 ms dispatch round trips, so the transfer — not host decode, not
device compute (228 ms/step) — bounded training at ~0.5 steps/s.

Design (TPU-first: ship sensor-sized payloads, rebuild geometry on
device):

- every field of the batch is packed into ONE ``(B, K)`` uint8 row-major
  buffer on the host -> exactly one ``device_put`` per step, sharded
  batch-major over the data mesh;
- the jitted step unpacks fields with static slices +
  ``lax.bitcast_convert_type`` (zero-copy reinterpretation, fused by XLA);
- the organized point cloud ships as fp16 depth ``z`` plus 4 per-example
  affine coefficients; the device reconstructs
  ``x = z * (a + b j), y = z * (c + d i)`` (pinhole geometry of the
  centerized crop is affine in pixel indices). Measured reconstruction
  error on packed training data: mean 0.9 mm, max 2.5 mm — below the
  3 mm Gaussian point noise the training augmentation injects
  (reference augmentation: ``reindexed.py:69-75``);
- boolean occupancy grids ship bit-packed (32x smaller).

Result: ~5.3 MB/batch(16) instead of ~16 MB, one H2D call, overlapped
with device compute by the feeder thread in ``loop.py``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# canonical field order; a schema is this list filtered by key presence.
# rgb ships 4:2:0 chroma-subsampled (the reference's own photometric
# augmentation degrades resolution down to 0.25x, so half-res chroma is
# far inside the training-noise envelope); z ships uint8-quantized over
# the per-example finite range (~0.5 mm at typical crop depth spans,
# inside the 2.5 mm affine-reconstruction budget).
_CANONICAL: Tuple[Tuple[str, str], ...] = (
    ("rgb", "yuv420"),
    ("z", "q8"),
    ("pcd_coef", "raw"),
    ("pcd", "raw"),
    ("grid_target", "bits"),
    ("grid_nontarget_empty", "bits"),
    ("class_id", "raw"),
    ("quaternion_true", "raw"),
    ("translation_true", "raw"),
    ("origin", "raw"),
    ("pitch", "raw"),
)


class TransferSchema:
    """Static layout of a packed transfer buffer.

    Built from one example host batch; ``pack`` runs on the host,
    ``unpack`` traces into the jitted step.
    """

    def __init__(self, batch: Dict[str, np.ndarray]):
        known = {name for name, _ in _CANONICAL}
        leftover = set(batch) - known
        if leftover:
            # a field the canonical table doesn't know would otherwise be
            # silently dropped from every training batch
            raise ValueError(
                f"batch keys {sorted(leftover)} missing from "
                "transfer._CANONICAL — add them to the schema table"
            )
        self.fields: List[Tuple[str, str, np.dtype, tuple, int, int]] = []
        offset = 0
        for name, kind in _CANONICAL:
            if name not in batch:
                continue
            arr = np.asarray(batch[name])
            shape = arr.shape[1:]
            if kind == "bits":
                assert arr.dtype == np.bool_, (name, arr.dtype)
                n = int(np.prod(shape, dtype=np.int64))
                assert n % 8 == 0, name
                nbytes = n // 8
                dtype = np.dtype(np.bool_)
            elif kind == "yuv420":
                H, W, C = shape
                if arr.dtype != np.uint8 or C != 3 or H % 2 or W % 2:
                    kind = "raw"  # fall back for odd shapes/dtypes
                    dtype = arr.dtype
                    nbytes = (
                        int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
                    )
                else:
                    nbytes = H * W + 2 * (H // 2) * (W // 2)
                    dtype = np.dtype(np.float32)  # unpacked dtype
            elif kind == "q8":
                H, W = shape
                # uint8 codes (0 = NaN) + fp32 zmin/zscale per example
                nbytes = H * W + 8
                dtype = np.dtype(np.float32)
            else:
                dtype = arr.dtype
                nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
            self.fields.append((name, kind, dtype, shape, offset, nbytes))
            offset += nbytes
        self.row_bytes = offset

    def pack(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """Host: batch dict -> (B, K) uint8 buffer."""
        import cv2

        B = len(next(iter(batch.values())))
        buf = np.empty((B, self.row_bytes), np.uint8)
        for name, kind, dtype, shape, offset, nbytes in self.fields:
            arr = np.ascontiguousarray(batch[name])
            dst = buf[:, offset : offset + nbytes]
            if kind == "bits":
                dst[...] = np.packbits(arr.reshape(B, -1), axis=1)
            elif kind == "yuv420":
                H, W, _ = shape
                n_y = H * W
                n_c = (H // 2) * (W // 2)
                # one cvtColor over the whole batch (pixelwise op, so the
                # (B*H, W) stacking is exact) — the per-example loop cost
                # ~35 ms/batch of pure Python/cv2 dispatch on the 1-core
                # host
                ycc = cv2.cvtColor(
                    arr.reshape(B * H, W, 3), cv2.COLOR_RGB2YCrCb
                ).reshape(B, H, W, 3)
                dst[:, :n_y] = ycc[..., 0].reshape(B, -1)
                # 2x2 mean-pool chroma in uint16 integer arithmetic
                # ((sum + 2) >> 2 == round(mean) for 4 samples); explicit
                # strided slices — a 6-D sum(axis=(2, 4)) walks memory in
                # an order ~12x slower on this host
                for ch, lo in ((1, n_y), (2, n_y + n_c)):
                    c16 = ycc[..., ch].reshape(
                        B, H // 2, 2, W // 2, 2
                    ).astype(np.uint16)
                    s = (
                        c16[:, :, 0, :, 0]
                        + c16[:, :, 0, :, 1]
                        + c16[:, :, 1, :, 0]
                        + c16[:, :, 1, :, 1]
                    )
                    dst[:, lo : lo + n_c] = (
                        ((s + 2) >> 2).astype(np.uint8).reshape(B, -1)
                    )
            elif kind == "q8":
                H, W = shape
                z = arr.reshape(B, -1).astype(np.float32)
                import warnings

                with warnings.catch_warnings():
                    # all-NaN rows are valid here (fully-truncated crops)
                    warnings.simplefilter("ignore", RuntimeWarning)
                    zmin = np.nanmin(z, axis=1)
                    zmax = np.nanmax(z, axis=1)
                bad = ~np.isfinite(zmin)
                zmin[bad] = 0.0
                zmax[bad] = 0.0
                scale = np.maximum(zmax - zmin, 1e-6) / 254.0
                q = (z - zmin[:, None]) * (1.0 / scale)[:, None]
                np.clip(q, 0.0, 254.0, out=q)
                q += 1.0
                np.rint(q, out=q)
                q[~np.isfinite(z)] = 0.0  # NaN depth -> code 0
                dst[:, : H * W] = q.astype(np.uint8)
                head = dst[:, H * W :].view(np.float32)
                head[:, 0] = zmin
                head[:, 1] = scale
            else:
                dst.view(dtype)[...] = arr.reshape(B, -1)
        return buf

    def unpack(self, buf) -> Dict:
        """Device (traced): (B, K) uint8 -> dict of typed arrays."""
        import jax.numpy as jnp
        from jax import lax

        out = {}
        B = buf.shape[0]
        for name, kind, dtype, shape, offset, nbytes in self.fields:
            col = lax.slice_in_dim(buf, offset, offset + nbytes, axis=1)
            if kind == "bits":
                shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
                bits = (col[:, :, None] >> shifts) & jnp.uint8(1)
                out[name] = bits.reshape((B,) + shape).astype(jnp.bool_)
                continue
            if kind == "yuv420":
                H, W, _ = shape
                n_y, n_c = H * W, (H // 2) * (W // 2)
                y = col[:, :n_y].reshape(B, H, W).astype(jnp.float32)
                cr = (
                    col[:, n_y : n_y + n_c]
                    .reshape(B, H // 2, W // 2)
                    .astype(jnp.float32)
                    - 128.0
                )
                cb = (
                    col[:, n_y + n_c :]
                    .reshape(B, H // 2, W // 2)
                    .astype(jnp.float32)
                    - 128.0
                )
                cr = jnp.repeat(jnp.repeat(cr, 2, axis=1), 2, axis=2)
                cb = jnp.repeat(jnp.repeat(cb, 2, axis=1), 2, axis=2)
                r = y + 1.403 * cr
                g = y - 0.714 * cr - 0.344 * cb
                bch = y + 1.773 * cb
                out[name] = jnp.clip(
                    jnp.stack([r, g, bch], axis=-1), 0.0, 255.0
                )
                continue
            if kind == "q8":
                H, W = shape
                q = col[:, : H * W].reshape(B, H, W)
                head = lax.bitcast_convert_type(
                    col[:, H * W :].reshape(B, 2, 4), jnp.float32
                )
                zmin = head[:, 0, None, None]
                scale = head[:, 1, None, None]
                z = zmin + (q.astype(jnp.float32) - 1.0) * scale
                out[name] = jnp.where(q == 0, jnp.nan, z)
                continue
            itemsize = dtype.itemsize
            if itemsize == 1:
                val = col
            else:
                val = lax.bitcast_convert_type(
                    col.reshape(B, nbytes // itemsize, itemsize),
                    jnp.dtype(dtype),
                )
            out[name] = val.reshape((B,) + shape)
        return out


def reconstruct_pcd(z, coef):
    """Device: fp16/fp32 z (B, H, W) + (B, 4) affine coefs -> (B, H, W, 3).

    NaN depth holes propagate to x and y, preserving the mask contract
    (``mask = ~isnan(pcd).any(-1)``).
    """
    import jax.numpy as jnp

    z = z.astype(jnp.float32)
    B, H, W = z.shape
    j = jnp.arange(W, dtype=jnp.float32)
    i = jnp.arange(H, dtype=jnp.float32)
    x = z * (coef[:, 0, None, None] + coef[:, 1, None, None] * j[None, None, :])
    y = z * (coef[:, 2, None, None] + coef[:, 3, None, None] * i[None, :, None])
    return jnp.stack([x, y, z], axis=-1)


def fit_pcd_coefs(pcd: np.ndarray) -> np.ndarray:
    """Host: least-squares affine fit of a batch of organized pcds.

    pcd (B, H, W, 3) with NaN holes -> (B, 4) float32 [a, b, c, d] with
    x/z ~= a + b*j and y/z ~= c + d*i. Vectorized closed-form 2x2 normal
    equations per example.
    """
    pcd = np.asarray(pcd)
    B, H, W = pcd.shape[:3]
    z = pcd[..., 2]
    valid = np.isfinite(pcd).all(-1) & (np.abs(z) > 1e-9)
    jj = np.broadcast_to(np.arange(W, dtype=np.float64), (H, W))
    ii = np.broadcast_to(np.arange(H, dtype=np.float64)[:, None], (H, W))

    out = np.zeros((B, 4), np.float32)
    for ch, t in ((0, jj), (1, ii)):
        r = np.where(valid, pcd[..., ch] / np.where(valid, z, 1.0), 0.0)
        tm = np.where(valid, t, 0.0)
        n = valid.sum((1, 2)).astype(np.float64)  # (B,)
        n = np.maximum(n, 1.0)
        St = tm.sum((1, 2))
        Stt = (tm * tm).sum((1, 2))
        Sr = r.sum((1, 2))
        Str = (tm * r).sum((1, 2))
        det = n * Stt - St * St
        det = np.where(np.abs(det) < 1e-9, 1.0, det)
        b = (n * Str - St * Sr) / det
        a = (Sr - b * St) / n
        out[:, 2 * ch] = a
        out[:, 2 * ch + 1] = b
    return out
