from .ema import ema_init, ema_update
from .optimizer import make_optimizer, wd_mask
from .schedule import LRConfig, epoch_lr, get_resolution, make_lr_schedule
from .state import TrainState
from .train_step import AdvConfig, make_eval_step, make_train_step

__all__ = [
    "ema_init",
    "ema_update",
    "make_optimizer",
    "wd_mask",
    "LRConfig",
    "epoch_lr",
    "get_resolution",
    "make_lr_schedule",
    "TrainState",
    "AdvConfig",
    "make_eval_step",
    "make_train_step",
]
