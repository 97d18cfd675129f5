# flake8: noqa: F401
from .timer import timer
from .provenance import githash
from .provenance import get_data_path
from .profiling import StepTimer
from .profiling import annotate
from .profiling import trace
