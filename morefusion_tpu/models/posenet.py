"""DenseFusion-style point-cloud baseline (the reference's singleview_pcd).

Reference: ``examples/ycb_video/singleview_pcd/contrib/models/model.py``
(:12-331): same 2D extractors as the flagship, then a PointNet-style tower
with a global average-pooled 1024-d feature broadcast back to each point —
no voxelization. Kept as the fast baseline / ablation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import PoseHeads, select_class
from .pspnet import PSPNetExtractor
from .resnet import DilatedResNet18, ResNet18Extractor
from .sampling import gather_pixels, masked_median, sample_mask_indices


class PoseNetExtractor(nn.Module):
    """Per-point features + broadcast global feature (1408-d total)."""

    @nn.compact
    def __call__(self, h_rgb, pcd):
        # h_rgb: (B, P, 32); pcd: (B, P, 3)
        h_rgb = nn.relu(nn.Dense(64)(h_rgb))
        h_pcd = nn.relu(nn.Dense(64)(pcd))
        feat1 = jnp.concatenate([h_rgb, h_pcd], axis=-1)  # 128
        h_rgb = nn.relu(nn.Dense(128)(h_rgb))
        h_pcd = nn.relu(nn.Dense(128)(h_pcd))
        feat2 = jnp.concatenate([h_rgb, h_pcd], axis=-1)  # 256
        h = nn.relu(nn.Dense(512)(feat2))
        h = nn.relu(nn.Dense(1024)(h))
        g = jnp.mean(h, axis=1, keepdims=True)  # (B, 1, 1024)
        feat3 = jnp.broadcast_to(g, (h.shape[0], h.shape[1], 1024))
        return jnp.concatenate([feat1, feat2, feat3], axis=-1)  # 1408


class PoseNet(nn.Module):
    """singleview_pcd baseline model."""

    n_fg_class: int
    n_point: int = 1000
    centerize_pcd: bool = True
    pretrained_resnet18: bool = False
    backbone_width: int = 64
    psp_bottleneck: int = 1024
    psp_up: tuple = (256, 64, 64)
    tower_widths: tuple = (640, 256, 128)

    def setup(self):
        if self.pretrained_resnet18:
            self.resnet_extractor = ResNet18Extractor()
        else:
            self.resnet_extractor = DilatedResNet18(
                base_width=self.backbone_width
            )
        self.pspnet_extractor = PSPNetExtractor(
            bottleneck_channels=self.psp_bottleneck, up_channels=self.psp_up
        )
        self.posenet_extractor = PoseNetExtractor()
        self.heads = PoseHeads(
            n_fg_class=self.n_fg_class, widths=self.tower_widths
        )

    def __call__(
        self,
        *,
        class_id,
        rgb,
        pcd,
        sample_indices: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        B, H, W, _ = rgb.shape
        mask = ~jnp.any(jnp.isnan(pcd), axis=-1)

        h_rgb = self.resnet_extractor(rgb)
        h_rgb = self.pspnet_extractor(h_rgb, train=train)

        if sample_indices is None:
            if rng is None:
                rng = jax.random.PRNGKey(1234)
            sample_indices = sample_mask_indices(mask, rng, self.n_point)

        values = gather_pixels(h_rgb, sample_indices)
        points = gather_pixels(pcd, sample_indices)
        points = jnp.nan_to_num(points)

        if self.centerize_pcd:
            center = masked_median(
                pcd.reshape(B, -1, 3), mask.reshape(B, -1)
            )  # (B, 3)
            points_in = points - center[:, None, :]
        else:
            points_in = points

        feat = self.posenet_extractor(values, points_in)
        cls_rot, cls_trans, cls_conf = self.heads(feat)
        rot, trans, conf = select_class(
            cls_rot, cls_trans, cls_conf, class_id - 1
        )
        trans = points + trans
        return rot, trans, conf
