"""TrainState — the explicit, pytree-structured training state.

Replaces Lightning's implicit module/optimizer/loop state (trainer runtime, L5
in SURVEY.md §1) with one NamedTuple that jit/shard_map thread through steps.
All fields are pytrees so the whole state shards under a Mesh and checkpoints
with orbax as a unit.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax

from neurosis_tpu.modules.ema import EmaState


class TrainState(NamedTuple):
    step: jax.Array  # int32 global step
    params: Any  # trainable params pytree
    opt_state: optax.OptState
    ema: Optional[EmaState]  # None when use_ema=False
    rng: jax.Array  # per-step PRNG key, split each step


def next_rngs(state_rng: jax.Array, n: int):
    """Split the state rng: returns (new_state_rng, rng_1..rng_n)."""
    keys = jax.random.split(state_rng, n + 1)
    return keys[0], *keys[1:]
