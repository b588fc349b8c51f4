"""CAME — Confidence-guided Adaptive Memory-Efficient optimizer.

Parity target: optimizers/came.py:13-226 (pytorch_optimizer-style CAME,
betas (0.9, 0.999, 0.9999), eps (1e-30, 1e-16), clip 1.0). Implemented as a
native optax GradientTransformation with factored second moments for ≥2D
params (rows/cols like Adafactor) and a factored confidence ("residual") EMA.

Reference math per step (CAME paper, Luo et al. 2023):
  m_t   = β1 m + (1-β1) g
  v_t   = β2 v + (1-β2) g²                (factored for matrices)
  u_t   = g / sqrt(v_t)   → clipped by RMS/clip_threshold
  m̂     = β1 m + (1-β1) u_t  (momentum over update)
  r_t   = β3 r + (1-β3) (u_t - m̂)²       (instability — factored)
  update = m̂ / sqrt(r_t)  · lr
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class _CameLeafState(NamedTuple):
    m: chex.Array
    v_row: chex.Array
    v_col: chex.Array
    v_full: chex.Array
    r_row: chex.Array
    r_col: chex.Array


class CameState(NamedTuple):
    count: chex.Array
    inner: optax.Updates  # tree of _CameLeafState


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def came(
    learning_rate: float | optax.Schedule = 2e-4,
    betas: tuple = (0.9, 0.999, 0.9999),
    weight_decay: float = 0.0,
    clip_threshold: float = 1.0,
    eps1: float = 1e-30,
    eps2: float = 1e-16,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def factored(shape) -> bool:
        return len(shape) >= 2

    def init_fn(params):
        def leaf(p):
            if factored(p.shape):
                return _CameLeafState(
                    m=jnp.zeros_like(p),
                    v_row=jnp.zeros(p.shape[:-1], p.dtype),
                    v_col=jnp.zeros(p.shape[:-2] + p.shape[-1:], p.dtype),
                    v_full=jnp.zeros((), p.dtype),
                    r_row=jnp.zeros(p.shape[:-1], p.dtype),
                    r_col=jnp.zeros(p.shape[:-2] + p.shape[-1:], p.dtype),
                )
            return _CameLeafState(
                m=jnp.zeros_like(p),
                v_row=jnp.zeros_like(p),
                v_col=jnp.zeros((), p.dtype),
                v_full=jnp.zeros(()),
                r_row=jnp.zeros_like(p),
                r_col=jnp.zeros((), p.dtype),
            )

        return CameState(count=jnp.zeros((), jnp.int32), inner=jax.tree_util.tree_map(leaf, params))

    def update_fn(grads, state, params=None):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf(g, s: _CameLeafState, p):
            g = g.astype(jnp.float32)
            if factored(g.shape):
                g2 = jnp.square(g) + eps1
                v_row = b2 * s.v_row + (1 - b2) * jnp.mean(g2, axis=-1)
                v_col = b2 * s.v_col + (1 - b2) * jnp.mean(g2, axis=-2)
                # factored approx: V ≈ row ⊗ col / mean(row)
                row_mean = jnp.mean(v_row, axis=-1, keepdims=True)
                vr = v_row / jnp.maximum(row_mean, eps1)
                u = g * jax.lax.rsqrt(vr[..., None]) * jax.lax.rsqrt(v_col[..., None, :])
            else:
                v_row = b2 * s.v_row + (1 - b2) * (jnp.square(g) + eps1)
                v_col = s.v_col
                u = g * jax.lax.rsqrt(v_row)

            u = u / jnp.maximum(1.0, _rms(u) / clip_threshold)
            m = b1 * s.m + (1 - b1) * u

            res = jnp.square(u - m) + eps2
            if factored(g.shape):
                r_row = b3 * s.r_row + (1 - b3) * jnp.mean(res, axis=-1)
                r_col = b3 * s.r_col + (1 - b3) * jnp.mean(res, axis=-2)
                rr_mean = jnp.mean(r_row, axis=-1, keepdims=True)
                rr = r_row / jnp.maximum(rr_mean, eps1)
                upd = m * jax.lax.rsqrt(rr[..., None]) * jax.lax.rsqrt(r_col[..., None, :])
            else:
                r_row = b3 * s.r_row + (1 - b3) * res
                r_col = s.r_col
                upd = m * jax.lax.rsqrt(r_row)

            step = -lr * upd
            if weight_decay > 0 and p is not None:
                step = step - lr * weight_decay * p.astype(jnp.float32)
            new_state = _CameLeafState(m=m, v_row=v_row, v_col=v_col, v_full=s.v_full, r_row=r_row, r_col=r_col)
            return step.astype(g.dtype), new_state

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.inner)
        flat_p = treedef.flatten_up_to(params) if params is not None else [None] * len(flat_g)
        results = [leaf(g, s, p) for g, s, p in zip(flat_g, flat_s, flat_p)]
        updates = jax.tree_util.tree_unflatten(treedef, [r[0] for r in results])
        new_inner = jax.tree_util.tree_unflatten(treedef, [r[1] for r in results])
        return updates, CameState(count=count, inner=new_inner)

    return optax.GradientTransformation(init_fn, update_fn)
