# flake8: noqa: F401
from .occupancy_mapping import MultiInstanceOccupancyMapping
from .occupancy_mapping import SparseVoxelMap
