"""Per-point pose regression heads (rot / trans / conf towers).

Reference: the three 4-stage 1x1-Conv1D towers shared by both models
(``singleview_3d/models/model.py:77-91`` and the singleview_pcd baseline).
1x1 convolutions over points are plain Dense layers applied per point —
they batch onto the MXU as ``(B*P, C)`` matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PoseHeads(nn.Module):
    """Point features -> per-class (quaternion, translation offset, confidence).

    Returns:
      cls_rot: ``(B, P, n_fg_class, 4)`` (unnormalized quaternions)
      cls_trans: ``(B, P, n_fg_class, 3)`` (offsets, caller scales/adds)
      cls_conf: ``(B, P, n_fg_class)`` in (0, 1)
    """

    n_fg_class: int
    widths: tuple = (640, 256, 128)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feat):
        B, P, _ = feat.shape

        def tower(h, out_dim, name):
            for i, width in enumerate(self.widths):
                h = nn.relu(
                    nn.Dense(
                        width, name=f"{name}_fc{i + 1}", dtype=self.dtype
                    )(h)
                )
            return nn.Dense(out_dim, name=f"{name}_out")(h)

        cls_rot = tower(feat, self.n_fg_class * 4, "rot")
        cls_trans = tower(feat, self.n_fg_class * 3, "trans")
        cls_conf = nn.sigmoid(tower(feat, self.n_fg_class, "conf"))

        cls_rot = cls_rot.reshape(B, P, self.n_fg_class, 4)
        cls_trans = cls_trans.reshape(B, P, self.n_fg_class, 3)
        return cls_rot, cls_trans, cls_conf


def select_class(cls_rot, cls_trans, cls_conf, fg_class_id):
    """Pick each sample's own class channel.

    Args:
      fg_class_id: ``(B,)`` zero-based foreground class ids.

    Returns:
      rot ``(B, P, 4)`` L2-normalized, trans ``(B, P, 3)``, conf ``(B, P)``.
    """
    B = cls_rot.shape[0]
    bidx = jnp.arange(B)
    rot = cls_rot[bidx, :, fg_class_id]  # (B, P, 4)
    trans = cls_trans[bidx, :, fg_class_id]
    conf = cls_conf[bidx, :, fg_class_id]
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return rot, trans, conf
