"""Optimizers (parity: optimizers/{adafactor,came,hybrid,utils}.py) on optax."""

from .adafactor import Adafactor, adafactor_relative_step_schedule
from .came import came
from .hybrid import hybrid_optimizer
from .utils import stochastic_round_bf16

__all__ = [
    "Adafactor",
    "adafactor_relative_step_schedule",
    "came",
    "hybrid_optimizer",
    "stochastic_round_bf16",
]
