"""Adafactor with fairseq-style relative-step LR (parity: optimizers/adafactor.py:13-291).

optax's factored second-moment core + the reference's relative-step schedule:
  rel_step(t) = min(1e-2, 1/sqrt(t))     (warmup_init: min(1e-6·t, 1/sqrt(t)))
param-scale multiplication (`scale_parameter`) maps to optax's
`multiply_by_parameter_scale`. The `AdafactorScheduler` LR-proxy is unnecessary
here — the schedule IS the optax learning_rate callable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def adafactor_relative_step_schedule(warmup_init: bool = False):
    """HF/fairseq `_get_lr` relative step size (adafactor.py:176-186)."""

    def schedule(step):
        t = jnp.maximum(step, 1).astype(jnp.float32)
        rel = jnp.minimum(1e-2, 1.0 / jnp.sqrt(t))
        if warmup_init:
            rel = jnp.minimum(1e-6 * t, 1.0 / jnp.sqrt(t))
        return rel

    return schedule


def Adafactor(
    lr: Optional[float] = None,
    eps: tuple = (1e-30, 1e-3),
    clip_threshold: float = 1.0,
    decay_rate: float = -0.8,
    beta1: Optional[float] = None,
    weight_decay: float = 0.0,
    scale_parameter: bool = True,
    relative_step: bool = True,
    warmup_init: bool = False,
) -> optax.GradientTransformation:
    """Config-surface-compatible Adafactor factory."""
    if lr is not None and relative_step:
        raise ValueError("Cannot combine manual `lr` and `relative_step=True` options")
    if warmup_init and not relative_step:
        raise ValueError("`warmup_init=True` requires `relative_step=True`")

    learning_rate = adafactor_relative_step_schedule(warmup_init) if relative_step else lr
    return optax.adafactor(
        learning_rate=learning_rate,
        min_dim_size_to_factor=2,
        decay_rate=-decay_rate if decay_rate < 0 else decay_rate,
        multiply_by_parameter_scale=scale_parameter,
        clipping_threshold=clip_threshold,
        momentum=beta1,
        weight_decay_rate=weight_decay if weight_decay > 0 else None,
        eps=eps[0],
    )
