from sstem_tpu.train.schedules import poly_warmup_decay_lr, step_lr
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step

__all__ = [
    "poly_warmup_decay_lr",
    "step_lr",
    "TrainState",
    "make_optimizer",
    "make_train_step",
]
