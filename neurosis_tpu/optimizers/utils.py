"""Optimizer helpers (parity: optimizers/utils.py:5 copy_stochastic_).

Stochastic bf16 rounding — on TPU this is a Pallas primitive
(pltpu.stochastic_round); the jnp fallback implements the same
truncate-with-random-carry bit trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """fp32 → bf16 with probability-proportional rounding."""
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rand = jax.random.randint(key, x.shape, 0, 1 << 16, dtype=jnp.uint32).astype(jnp.uint32)
    rounded = (bits + rand) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
