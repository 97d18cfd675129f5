"""Datasets (layer L3): asset banks, frame sources, the instance-example
factory, reindex materializer, loaders, and training transform."""

# flake8: noqa: F401

from .base import ConcatDataset
from .base import DatasetBase
from .base import ModelsBase
from .base import VoxelGrid
from .procedural import ProceduralModels
from .transform import Transform
from .rgbd_pose_estimation.base import RGBDPoseEstimationDatasetBase
from .rgbd_pose_estimation.synthetic import SyntheticRGBDPoseEstimationDataset
from .rgbd_pose_estimation.reindex import rebuild_meta, reindex
from .rgbd_pose_estimation.reindexed import RGBDPoseEstimationDatasetReIndexed
from .rgbd_pose_estimation.reindexed import RandomSamplingDataset
from .packed import PackedPoseDataset
from .packed import derive_transfer_arrays
from .packed import has_transfer_arrays
from .packed import is_packed
from .packed import pack_reindexed
from . import ycb_video
from .external_results import load_posecnn_mat
from .external_results import load_results_json
from .instance_segmentation import SyntheticInstanceSegmentationDataset
from .background_composite import BackgroundComposite
from .rgbd_pose_estimation.frame_directory import FrameDirectoryDataset
from .rgbd_pose_estimation.frame_directory import save_frame


def __getattr__(name):
    # Reference parity: ``morefusion.datasets.YCBVideoModels`` etc. live at
    # the package top level (``morefusion/datasets/__init__.py:1-35``).
    # Lazy because they require the real YCB-Video data on disk.
    if name in (
        "YCBVideoModels",
        "YCBVideoDataset",
        "YCBVideoSyntheticDataset",
        "YCBVideoRGBDPoseEstimationDataset",
    ):
        from . import ycb_video as _yv

        return getattr(_yv, name)
    raise AttributeError(name)
