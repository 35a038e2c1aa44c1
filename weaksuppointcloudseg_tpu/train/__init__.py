from weaksuppointcloudseg_tpu.train.state import TrainState, create_train_state
from weaksuppointcloudseg_tpu.train.steps import (
    make_train_step,
    make_eval_step,
    make_forward_fn,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_forward_fn",
]
