"""Pose-prediction models (layer L4), flax.linen / NHWC.

Mirrors the reference model zoo: ``DilatedResNet18/34`` + ``PSPNetExtractor``
extractors, the ``PoseNet`` DenseFusion baseline (singleview_pcd), and the
flagship ``SingleView3D`` volumetric model (singleview_3d), plus batched
loss/eval in ``losses``.
"""

# flake8: noqa: F401

from .resnet import DilatedResNet18
from .resnet import DilatedResNet34
from .resnet import ResNet18Extractor
from .pspnet import PSPNetExtractor
from .posenet import PoseNet
from .posenet import PoseNetExtractor
from .singleview_3d import SingleView3D
from .heads import PoseHeads
from .heads import select_class
from .sampling import compute_origin
from .sampling import gather_pixels
from .sampling import masked_median
from .sampling import sample_mask_indices
from . import losses


def tiny_singleview3d(n_fg_class, n_point=32, with_occupancy=False, **kw):
    """CI-sized SingleView3D: same topology, ~100x fewer FLOPs.

    For unit tests and CPU-mesh dry runs; production uses the defaults.
    """
    return SingleView3D(
        n_fg_class=n_fg_class,
        n_point=n_point,
        with_occupancy=with_occupancy,
        backbone_width=8,
        psp_bottleneck=64,
        psp_up=(32, 16, 16),
        conv3_channels=32,
        conv4_channels=64,
        tower_widths=(64, 32, 16),
        **kw,
    )
