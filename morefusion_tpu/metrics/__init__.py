"""Evaluation metrics (layer L7): ADD/ADD-S and VOCap AUC.

Public surface mirrors ``morefusion/metrics/__init__.py``. The VOCap AUC is
a bit-for-bit port of the YCB_Video_toolbox formula — this is the scoreboard
metric, so numerics must match exactly.
"""

# flake8: noqa: F401

from .average_distance import average_distance
from .auc import auc_for_errors
from .auc import ycb_video_add_auc
