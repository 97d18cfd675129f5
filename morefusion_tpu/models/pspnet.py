"""PSPNet pixel-feature extractor (flax.linen, NHWC).

Reference: ``morefusion/models/dense_fusion/pspnet.py:10-82`` — pyramid
pooling at sizes (1, 2, 3, 6) over the 1/8-resolution 512-channel backbone
feature, bottleneck to 1024, three x2 upsample stages back to full
resolution, 1x1 head to 32 channels with a channel-wise log-softmax
(the reference's DenseFusion quirk — kept for numeric parity).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_bilinear(x, h, w):
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method="bilinear")


class PSPModule(nn.Module):
    out_channels: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hs = []
        for size in self.sizes:
            kh, kw = max(1, H // size), max(1, W // size)
            h = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
            h = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = _resize_bilinear(h, H, W)
            hs.append(h)
        hs.append(x)
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(
            jnp.concatenate(hs, axis=-1)
        )
        return nn.relu(h)


class PSPUpsample(nn.Module):
    out_channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _resize_bilinear(x, H * 2, W * 2)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype
        )(h)
        return nn.PReLU()(h)


class PSPNetExtractor(nn.Module):
    """1/8-res backbone feature -> full-res 32-ch per-pixel feature.

    Defaults are the reference architecture; the channel fields exist for
    CI-sized variants."""

    out_channels: int = 32
    bottleneck_channels: int = 1024
    up_channels: Sequence[int] = (256, 64, 64)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        h = PSPModule(out_channels=self.bottleneck_channels, dtype=dt)(x)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = PSPUpsample(self.up_channels[0], dtype=dt)(h)
        h = nn.Dropout(0.15, deterministic=not train)(h)
        h = PSPUpsample(self.up_channels[1], dtype=dt)(h)
        h = nn.Dropout(0.15, deterministic=not train)(h)
        h = PSPUpsample(self.up_channels[2], dtype=dt)(h)
        h = nn.Conv(self.out_channels, (1, 1), dtype=dt)(h)
        # log_softmax in f32 (numerics) — reference head behavior
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)
