"""Training orchestration: schedules, trainer, metrics, checkpointing."""

from . import schedules  # noqa: F401
from .trainer import (  # noqa: F401
    TrainState,
    build_schedule,
    fit,
    init_train_state,
    make_loss,
    make_optimizer,
    make_train_step,
    resume_training,
)
