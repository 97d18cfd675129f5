"""Non-differentiable geometry utilities (layer L2 of the reference).

Public surface mirrors ``morefusion/geometry/__init__.py``. Host-side code is
NumPy; ``nn`` (KNN) re-exports the JAX/MXU implementation from
``morefusion_tpu.functions``. Open3D/trimesh dependencies of the reference
are replaced with self-contained NumPy/SciPy implementations.
"""

# flake8: noqa: F401

from ..functions.knn import nn
from .pointcloud import pointcloud_from_depth
from .pointcloud import estimate_pointcloud_normals
from .pointcloud import voxel_down_sample
from .bbox import masks_to_bboxes
from .bbox import get_aabb_from_points
from .cameras import look_at
from .cameras import points_from_angles
from .cameras import project_to_camera
from .cameras import uniform_points_on_sphere
from .cameras import to_opengl_transform
from .cameras import from_opengl_transform
from .transform import compose_transform
from .transform import quaternion_from_matrix
from .transform import quaternion_matrix_np
from .transform import translation_from_matrix
from .transform import transform_points_np
from .voxel_mapping import VoxelMapping
from . import trajectory
