from summarymixing_tpu.training.optim import (
    make_adamw,
    make_two_stage_adam_sgd,
    noam_schedule,
    warm_and_exp_decay_schedule,
)
from summarymixing_tpu.training.metrics import (
    ErrorRateStats,
    AccuracyStats,
    edit_distance,
)

__all__ = [
    "make_adamw",
    "make_two_stage_adam_sgd",
    "noam_schedule",
    "warm_and_exp_decay_schedule",
    "ErrorRateStats",
    "AccuracyStats",
    "edit_distance",
]
