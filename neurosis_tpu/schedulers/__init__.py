"""LR schedules (parity: schedulers/{cosine,hf,linear,warmup,base}.py) as optax Schedules.

All return `step -> multiplier` (or absolute lr where the reference does);
compose with optimizers via `optax.scale_by_schedule` or pass as learning_rate.
"""

from .schedules import (
    cosine_annealing_warmup_restarts,
    cosine_decay_with_warmup,
    cosine_warmup_schedule,
    cosine_warmup_schedule_staged,
    cosine_with_warmup,
    cosine_with_hard_restarts,
    lambda_linear_scheduler,
    legacy_cosine_annealing_warmup_restarts,
    lambda_warmup_cosine_scheduler2,
    linear_warmup_schedule,
)

__all__ = [
    "cosine_annealing_warmup_restarts",
    "cosine_decay_with_warmup",
    "cosine_warmup_schedule",
    "cosine_warmup_schedule_staged",
    "cosine_with_warmup",
    "cosine_with_hard_restarts",
    "lambda_linear_scheduler",
    "legacy_cosine_annealing_warmup_restarts",
    "lambda_warmup_cosine_scheduler2",
    "linear_warmup_schedule",
]
