from mscs_tpu.train.schedules import convert_restarts_to_steps, make_lr_schedule
from mscs_tpu.train.optim import build_optimizer
from mscs_tpu.train.state import (
    TrainState,
    make_eval_step,
    make_train_multistep,
    make_train_step,
    output_flags,
    split_outputs,
)

__all__ = [
    "convert_restarts_to_steps", "make_lr_schedule", "build_optimizer",
    "TrainState", "make_eval_step", "make_train_multistep", "make_train_step",
    "output_flags", "split_outputs",
]
