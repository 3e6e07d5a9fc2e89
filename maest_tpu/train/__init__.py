from .metrics import gather_across_hosts, macro_ap_roc
from .schedules import cosine_cycle, exp_warmup_linear_down, make_schedule
from .state import TrainState, make_optimizer, swa_update
from .steps import (
    AugmentConfig,
    bce_with_logits,
    make_eval_step,
    make_predict_step,
    make_train_step,
)

__all__ = [
    "AugmentConfig",
    "TrainState",
    "bce_with_logits",
    "cosine_cycle",
    "exp_warmup_linear_down",
    "gather_across_hosts",
    "macro_ap_roc",
    "make_eval_step",
    "make_optimizer",
    "make_predict_step",
    "make_schedule",
    "make_train_step",
    "swa_update",
]
