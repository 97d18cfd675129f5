"""Datasets (layer L3): asset banks, frame sources, the instance-example
factory, reindex materializer, loaders, and training transform."""

# flake8: noqa: F401

from .base import DatasetBase
from .base import ModelsBase
from .base import VoxelGrid
from .procedural import ProceduralModels
from .transform import Transform
from .rgbd_pose_estimation.base import RGBDPoseEstimationDatasetBase
from .rgbd_pose_estimation.synthetic import SyntheticRGBDPoseEstimationDataset
from .rgbd_pose_estimation.reindex import reindex
from .rgbd_pose_estimation.reindexed import RGBDPoseEstimationDatasetReIndexed
from .rgbd_pose_estimation.reindexed import RandomSamplingDataset
from . import ycb_video
from .external_results import load_posecnn_mat
from .external_results import load_results_json
from .instance_segmentation import SyntheticInstanceSegmentationDataset
from .background_composite import BackgroundComposite
from .rgbd_pose_estimation.frame_directory import FrameDirectoryDataset
from .rgbd_pose_estimation.frame_directory import save_frame
