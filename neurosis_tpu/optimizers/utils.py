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


def apply_updates_stochastic(params, updates, key: jax.Array):
    """optax.apply_updates with stochastic bf16 rounding (parity: the
    reference optimizers' `copy_stochastic_` path, optimizers/utils.py:5 —
    CAME/Adafactor round bf16 params probabilistically so tiny updates are
    not systematically lost to round-to-nearest).

    fp32/other leaves apply exactly; bf16 leaves accumulate in fp32 then
    round with probability proportional to the remainder.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    u_leaves = treedef.flatten_up_to(updates)
    keys = jax.random.split(key, len(leaves))

    out = []
    for p, u, k in zip(leaves, u_leaves, keys):
        if u is None:
            out.append(p)
        elif p.dtype == jnp.bfloat16:
            new = p.astype(jnp.float32) + u.astype(jnp.float32)
            out.append(stochastic_round_bf16(new, k))
        else:
            out.append((p + u.astype(p.dtype)).astype(p.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
