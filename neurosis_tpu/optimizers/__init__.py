"""Optimizers (parity: optimizers/{adafactor,came,hybrid,utils}.py) on optax."""

from .adafactor import Adafactor, adafactor_relative_step_schedule
from .adamw8bit import adamw8bit, scale_by_adam_8bit
from .came import came
from .hybrid import hybrid_optimizer
from .utils import apply_updates_stochastic, stochastic_round_bf16

__all__ = [
    "Adafactor",
    "adafactor_relative_step_schedule",
    "adamw8bit",
    "came",
    "hybrid_optimizer",
    "scale_by_adam_8bit",
    "apply_updates_stochastic",
    "stochastic_round_bf16",
]
