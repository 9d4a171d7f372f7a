from agrl_tpu.optim.optimizers import (
    OPTIMIZER_NAMES,
    adabound,
    init_optim,
    radam,
)
from agrl_tpu.optim.schedules import multistep_lr, per_step, warmup_multistep_lr

__all__ = [
    "OPTIMIZER_NAMES",
    "adabound",
    "init_optim",
    "multistep_lr",
    "per_step",
    "radam",
    "warmup_multistep_lr",
]
