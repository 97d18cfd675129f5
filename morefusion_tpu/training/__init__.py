# flake8: noqa: F401
from .trainer import CadPointBank
from .trainer import TrainState
from .trainer import create_train_state
from .trainer import jit_train_step
from .trainer import make_dp_eval_step
from .trainer import make_dp_train_step
from .trainer import make_eval_step
from .trainer import make_train_step
from .trainer import stack_examples
from .evaluator import Evaluator
from .evaluator import summarize_records
from .reporting import LogReport
from .reporting import load_args
from .reporting import write_args
from .checkpoints import (
    CheckpointManager,
    export_params_npz,
    import_backbone_npz,
    import_params_npz,
)
from .data import BatchLoader
from . import loop
