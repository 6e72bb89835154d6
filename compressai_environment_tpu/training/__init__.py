from .losses import rate_distortion_loss
from .optim import (
    PlateauScheduler,
    TrainState,
    eval_step,
    get_learning_rate,
    init_train_state,
    make_optimizers,
    set_learning_rate,
    train_step,
)

__all__ = [
    "rate_distortion_loss",
    "make_optimizers",
    "init_train_state",
    "train_step",
    "eval_step",
    "TrainState",
    "PlateauScheduler",
    "set_learning_rate",
    "get_learning_rate",
]
