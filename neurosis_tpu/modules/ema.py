"""EMA over parameter pytrees (parity: modules/ema.py LitEma:11-91, EMA:94-330).

JAX redesign: instead of a buffer-holding nn.Module with name mangling, the EMA
state is just a pytree the train step threads through — `ema_update` is pure and
lives inside the jitted step, so the shadow params stay device-resident and the
update fuses with the optimizer apply.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any  # shadow tree, same structure as model params
    num_updates: jax.Array  # int32 step counter (-1 disables warmup)


def ema_init(params: Any, use_num_updates: bool = True) -> EmaState:
    """LitEma.__init__ (ema.py:11-38): shadow = copy of params, counter 0/-1."""
    shadow = jax.tree_util.tree_map(lambda p: jnp.asarray(p, jnp.float32), params)
    n = jnp.asarray(0 if use_num_updates else -1, jnp.int32)
    return EmaState(shadow, n)


def ema_update(state: EmaState, params: Any, decay: float = 0.9999) -> EmaState:
    """LitEma.forward (ema.py:40-59): warmup decay min(decay, (1+n)/(10+n)),
    shadow ← shadow − (1−d)·(shadow − param)."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    warm = (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32))
    d = jnp.where(n >= 0, jnp.minimum(decay, warm), decay)
    one_minus = 1.0 - d

    def _upd(s, p):
        return s - one_minus * (s - p.astype(jnp.float32))

    return EmaState(jax.tree_util.tree_map(_upd, state.params, params), n)


def ema_update_warmup(
    state: EmaState,
    params: Any,
    beta: float = 0.9999,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EmaState:
    """EMA.get_current_decay (ema.py:94-330): (1 − (1 + n/inv_gamma)^−power),
    clamped to [min_value, beta]."""
    n = state.num_updates + 1
    epoch = jnp.clip(n.astype(jnp.float32), 0.0, None)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    d = jnp.clip(value, min_value, beta)
    one_minus = 1.0 - d

    def _upd(s, p):
        return s - one_minus * (s - p.astype(jnp.float32))

    return EmaState(jax.tree_util.tree_map(_upd, state.params, params), n)


def ema_copy_to(state: EmaState, like: Optional[Any] = None) -> Any:
    """LitEma.copy_to: materialize shadow params (cast to the live tree's dtypes)."""
    if like is None:
        return state.params
    return jax.tree_util.tree_map(lambda s, p: s.astype(p.dtype), state.params, like)
