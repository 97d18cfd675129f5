"""The flagship volumetric pose-prediction model (MoreFusion paper model).

TPU-native redesign of
``morefusion/contrib/singleview_3d/models/model.py:12-481``:

- one fused forward graph for the whole batch — the reference's per-sample
  Python loops (pixel sampling, origin computation, per-sample loss) become
  fixed-shape batched ops (see ``models/sampling.py`` and ``losses.py``);
- 2D CNN (DilatedResNet18 + PSPNet) -> per-pixel 32-ch features;
- 1000 masked pixels sampled per instance; point MLP towers (1x1 convs ==
  Dense) build 72/144-d point features;
- scatter-mean voxelization of the 144-d features into a 32^3 grid
  (``functions.average_voxelization_3d``), optional occupancy branch: two
  3D convs over the no-entry grid concatenated into the voxel features;
- two strided 3D convs (16^3 x256, 8^3 x512) whose outputs are pulled back
  onto the points with trilinear interpolation
  (``functions.interpolate_voxel_grid``);
- per-class rot/trans/conf towers; per-point quaternions + translations.

Voxel grids are channels-last; all convs are NHWC/NDHWC.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import functions as F
from .heads import PoseHeads, select_class
from .pspnet import PSPNetExtractor
from .resnet import DilatedResNet18, ResNet18Extractor
from .sampling import compute_origin, gather_pixels, sample_mask_indices


class SingleView3D(nn.Module):
    """Volumetric pose prediction with surrounding-occupancy awareness."""

    n_fg_class: int
    n_point: int = 1000
    voxel_dim: int = 32
    with_occupancy: bool = False
    pretrained_resnet18: bool = False
    # architecture widths (defaults = reference; shrink for CI-sized tests)
    backbone_width: int = 64
    psp_bottleneck: int = 1024
    psp_up: tuple = (256, 64, 64)
    conv3_channels: int = 256
    conv4_channels: int = 512
    tower_widths: tuple = (640, 256, 128)
    # per-point feature widths (conv1_rgb, conv1_pcd, conv2_rgb,
    # conv2_pcd); defaults = reference (models/singleview_3d/
    # pose_net.py fusion widths). The MFU probe tests MXU-lane-aligned
    # variants (e.g. (64, 8, 96, 16): 96+16+16 occ = 128 channels into
    # conv3 instead of 160) — changing these changes param shapes, so
    # non-default values cannot warm-start from committed checkpoints.
    point_widths: tuple = (64, 8, 128, 16)
    # computation dtype for the conv/dense stacks; params stay f32 and the
    # pose outputs (quaternion normalize, translation add) stay f32.
    # bf16 roughly doubles v5e inference throughput.
    compute_dtype: object = jnp.float32

    def setup(self):
        dt = self.compute_dtype
        if self.pretrained_resnet18:
            self.resnet_extractor = ResNet18Extractor()
        else:
            self.resnet_extractor = DilatedResNet18(
                base_width=self.backbone_width, dtype=dt
            )
        self.pspnet_extractor = PSPNetExtractor(
            bottleneck_channels=self.psp_bottleneck, up_channels=self.psp_up,
            dtype=dt,
        )

        w1r, w1p, w2r, w2p = self.point_widths
        self.conv1_rgb = nn.Dense(w1r, dtype=dt)
        self.conv1_pcd = nn.Dense(w1p, dtype=dt)
        self.conv2_rgb = nn.Dense(w2r, dtype=dt)
        self.conv2_pcd = nn.Dense(w2p, dtype=dt)

        if self.with_occupancy:
            self.conv1_occ = nn.Conv(
                8, (3, 3, 3), padding=[(1, 1)] * 3, dtype=dt
            )
            self.conv2_occ = nn.Conv(
                16, (3, 3, 3), padding=[(2, 2)] * 3,
                kernel_dilation=(2, 2, 2), dtype=dt,
            )

        self.conv3 = nn.Conv(
            self.conv3_channels, (4, 4, 4), strides=(2, 2, 2),
            padding=[(1, 1)] * 3, dtype=dt,
        )
        self.conv4 = nn.Conv(
            self.conv4_channels, (4, 4, 4), strides=(2, 2, 2),
            padding=[(1, 1)] * 3, dtype=dt,
        )

        self.heads = PoseHeads(
            n_fg_class=self.n_fg_class, widths=self.tower_widths, dtype=dt
        )

    def _extract(self, values, points, grid_nontarget_empty, train):
        """Fuse point features through the voxel 3D-CNN.

        Args:
          values: ``(B, P, 32)`` sampled pixel features.
          points: ``(B, P, 3)`` voxel-frame coordinates in [0, voxel_dim).
          grid_nontarget_empty: ``(B, V, V, V)`` no-entry grid or None.

        Returns:
          ``(B, P, 984)`` fused per-point features.
        """
        B, P, _ = values.shape
        V = self.voxel_dim

        to_center = (V / 2.0 - 0.5) - points

        values = values.astype(self.compute_dtype)
        to_center = to_center.astype(self.compute_dtype)
        h_rgb = nn.relu(self.conv1_rgb(values))
        h_pcd = nn.relu(self.conv1_pcd(to_center))
        feat1 = jnp.concatenate([h_rgb, h_pcd], axis=-1)  # (B, P, 72)
        h_rgb = nn.relu(self.conv2_rgb(h_rgb))
        h_pcd = nn.relu(self.conv2_pcd(h_pcd))
        feat2 = jnp.concatenate([h_rgb, h_pcd], axis=-1)  # (B, P, 144)

        batch_indices = jnp.repeat(
            jnp.arange(B, dtype=jnp.int32), P
        )  # (B*P,)
        flat_points = points.reshape(B * P, 3)

        voxelized = F.average_voxelization_3d(
            feat2.reshape(B * P, -1),
            flat_points,
            batch_indices,
            batch_size=B,
            origin=(0.0, 0.0, 0.0),
            pitch=1.0,
            dimensions=(V, V, V),
        )  # (B, V, V, V, 144)

        if self.with_occupancy:
            occ = grid_nontarget_empty.astype(jnp.float32)[..., None]
            h_occ = nn.relu(self.conv1_occ(occ))
            h_occ = nn.relu(self.conv2_occ(h_occ))
            voxelized = jnp.concatenate([voxelized, h_occ], axis=-1)

        h = nn.relu(self.conv3(voxelized))  # (B, 16, 16, 16, 256)
        feat3 = F.interpolate_voxel_grid(
            h, flat_points / 2.0, batch_indices
        ).reshape(B, P, -1)
        h = nn.relu(self.conv4(h))  # (B, 8, 8, 8, 512)
        feat4 = F.interpolate_voxel_grid(
            h, flat_points / 4.0, batch_indices
        ).reshape(B, P, -1)

        return jnp.concatenate([feat1, feat2, feat3, feat4], axis=-1)

    def __call__(
        self,
        *,
        class_id,
        rgb,
        pcd,
        pitch,
        origin: Optional[jnp.ndarray] = None,
        grid_nontarget_empty: Optional[jnp.ndarray] = None,
        sample_indices: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """Predict per-point poses.

        Args:
          class_id: ``(B,)`` one-based class ids (0 = background).
          rgb: ``(B, H, W, 3)`` uint8-range.
          pcd: ``(B, H, W, 3)`` camera-frame points, NaN = invalid.
          pitch: ``(B,)`` voxel size per sample (class-dependent).
          origin: ``(B, 3)`` voxel-grid origin; computed from the masked
            median if None.
          grid_nontarget_empty: ``(B, V, V, V)`` no-entry grid (occupancy
            variant only).
          sample_indices: ``(B, n_point)`` precomputed flat pixel indices;
            if None they are sampled from ``rng``.
          train: enables dropout (needs a 'dropout' PRNG).

        Returns:
          quaternion ``(B, P, 4)``, translation ``(B, P, 3)`` (camera
          frame), confidence ``(B, P)``.
        """
        B, H, W, _ = rgb.shape
        V = self.voxel_dim
        mask = ~jnp.any(jnp.isnan(pcd), axis=-1)  # (B, H, W)

        h_rgb = self.resnet_extractor(rgb)
        h_rgb = self.pspnet_extractor(h_rgb, train=train)  # (B, H, W, 32)

        if sample_indices is None:
            if rng is None:
                rng = jax.random.PRNGKey(1234)  # eval determinism (ref :210)
            sample_indices = sample_mask_indices(mask, rng, self.n_point)

        values = gather_pixels(h_rgb, sample_indices)  # (B, P, 32)
        points_cam = gather_pixels(pcd, sample_indices)  # (B, P, 3)
        points_cam = jnp.nan_to_num(points_cam)

        if origin is None:
            origin = compute_origin(pcd, mask, pitch, V)

        # camera frame -> voxel grid frame
        points = (points_cam - origin[:, None, :]) / pitch[:, None, None]

        feat = self._extract(values, points, grid_nontarget_empty, train)

        cls_rot, cls_trans, cls_conf = self.heads(feat)
        fg_class_id = class_id - 1
        rot, trans, conf = select_class(cls_rot, cls_trans, cls_conf, fg_class_id)

        # translation: per-point offset in voxel units -> camera frame
        trans = points_cam + trans * pitch[:, None, None]
        return rot, trans, conf
