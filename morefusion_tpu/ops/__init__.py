"""Pallas TPU kernels for the hot ops.

The default implementations in ``morefusion_tpu.functions`` are pure
XLA (segment ops / gathers) and are already TPU-efficient; the kernels here
are drop-in accelerations for the profiled hot spots. Each kernel has a
same-semantics XLA fallback and is parity-tested against it.
"""

# flake8: noqa: F401

from .connected_components import connected_components
from .connected_components import relabel_components
from .knn_pallas import nn_pallas
