"""Dilated ResNet feature extractors (flax.linen, NHWC).

Two variants, mirroring the reference:

- ``DilatedResNet18/34`` — the DenseFusion-style from-scratch ResNet
  (reference ``morefusion/models/dense_fusion/resnet.py:10-136``): no
  normalization layers, bias-free 3x3 convs, res4/res5 at stride 1 with
  dilation 2/4 so the output stays at 1/8 resolution with 512 channels.
  This is the default backbone of the reference training recipe
  (``train.py`` uses ``pretrained_resnet18=False``).
- ``ResNet18Extractor`` — the BN variant of the torchvision/chainercv2
  ResNet18 (reference ``morefusion/models/resnet.py:7-52``) with BatchNorm
  permanently in inference mode (the reference freezes BN); provided for
  pretrained-weight compatibility.

Inputs are uint8-range RGB ``(B, H, W, 3)``; ImageNet normalization happens
inside (reference behavior).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


MEAN_RGB = (0.485, 0.456, 0.406)
STD_RGB = (0.229, 0.224, 0.225)


def normalize_rgb(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(MEAN_RGB, dtype=jnp.float32)
    std = jnp.asarray(STD_RGB, dtype=jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


class BasicBlock(nn.Module):
    """Norm-free basic residual block (DenseFusion variant)."""

    out_channels: int
    stride: int = 1
    dilate: int = 1
    residual_conv: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilate, self.dilate)] * 2,
            kernel_dilation=(self.dilate, self.dilate),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(self.dilate, self.dilate)] * 2,
            kernel_dilation=(self.dilate, self.dilate),
            use_bias=False,
            dtype=self.dtype,
        )(h)
        if self.residual_conv:
            residual = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        else:
            residual = x
        return nn.relu(h + residual)


class ResBlock(nn.Module):
    n_layer: int
    out_channels: int
    stride: int
    dilate: int
    residual_conv: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = BasicBlock(
            self.out_channels,
            stride=self.stride,
            dilate=1,
            residual_conv=self.residual_conv,
            dtype=self.dtype,
        )(x)
        for _ in range(self.n_layer - 1):
            h = BasicBlock(
                self.out_channels, dilate=self.dilate, dtype=self.dtype
            )(h)
        return h


class DilatedResNet(nn.Module):
    """Norm-free dilated ResNet: 1/8-resolution, (8*base_width)-channel
    output. ``base_width=64`` is the reference architecture; smaller values
    give CI-sized variants."""

    blocks: Sequence[int]
    base_width: int = 64
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, rgb):
        w = self.base_width
        dt = self.dtype
        h = normalize_rgb(rgb).astype(dt)
        # 1/1 -> 1/2
        h = nn.Conv(
            w, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
            use_bias=False, dtype=dt,
        )(h)
        # 1/2 -> 1/4 (floor-mode 3x3/2 max pool, pad 1)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        h = ResBlock(self.blocks[0], w, 1, 1, residual_conv=False, dtype=dt)(h)
        # 1/4 -> 1/8
        h = ResBlock(self.blocks[1], w * 2, 2, 1, dtype=dt)(h)
        h = ResBlock(self.blocks[2], w * 4, 1, 2, dtype=dt)(h)
        h = ResBlock(self.blocks[3], w * 8, 1, 4, dtype=dt)(h)
        return h


class DilatedResNet18(DilatedResNet):
    blocks: Sequence[int] = (2, 2, 2, 2)


class DilatedResNet34(DilatedResNet):
    blocks: Sequence[int] = (3, 4, 6, 3)


class BNBasicBlock(nn.Module):
    """BatchNorm basic block with frozen (inference-mode) statistics."""

    out_channels: int
    stride: int = 1
    dilate: int = 1
    residual_conv: bool = False

    @nn.compact
    def __call__(self, x):
        def bn(h):
            return nn.BatchNorm(use_running_average=True)(h)

        h = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilate, self.dilate)] * 2,
            kernel_dilation=(self.dilate, self.dilate),
            use_bias=False,
        )(x)
        h = nn.relu(bn(h))
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(self.dilate, self.dilate)] * 2,
            kernel_dilation=(self.dilate, self.dilate),
            use_bias=False,
        )(h)
        h = bn(h)
        if self.residual_conv:
            residual = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
            )(x)
            residual = nn.BatchNorm(use_running_average=True)(residual)
        else:
            residual = x
        return nn.relu(h + residual)


class ResNet18Extractor(nn.Module):
    """Frozen-BN dilated ResNet18 (pretrained-weight-compatible layout).

    The reference additionally stops gradients below res3 ("unchain at
    res2", ``morefusion/models/resnet.py:49-50``); we reproduce that with
    ``stop_gradient`` so the early stages act as a fixed feature extractor.
    """

    @nn.compact
    def __call__(self, rgb):
        h = normalize_rgb(rgb)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False)(h)
        h = nn.relu(nn.BatchNorm(use_running_average=True)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        # res2
        h = BNBasicBlock(64)(h)
        h = BNBasicBlock(64)(h)
        h = jax.lax.stop_gradient(h)
        # res3 (1/8)
        h = BNBasicBlock(128, stride=2, residual_conv=True)(h)
        h = BNBasicBlock(128)(h)
        # res4 (stride 1, dilation 2)
        h = BNBasicBlock(256, stride=1, residual_conv=True)(h)
        h = BNBasicBlock(256, dilate=2)(h)
        # res5 (stride 1, dilation 4)
        h = BNBasicBlock(512, stride=1, residual_conv=True)(h)
        h = BNBasicBlock(512, dilate=4)(h)
        return h

