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
