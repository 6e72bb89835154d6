from .losses import rate_distortion_loss
from .optim import TrainState, init_train_state, make_optimizers, train_step

__all__ = [
    "rate_distortion_loss",
    "make_optimizers",
    "init_train_state",
    "train_step",
    "TrainState",
]
