# flake8: noqa: F401
from .mesh import data_mesh
from .mesh import replicate
from .mesh import shard_batch
from .mesh import local_batch_slice
