"""CFG guiders (parity: modules/guidance.py:10-90).

The batch-doubling trick is preserved — on TPU the doubled batch rides the same
compiled executable, and uncond/cond halves stay on-device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from neurosis_tpu.utils import append_dims

COND_KEYS = ("vector", "crossattn", "concat")


class Guider:
    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        raise NotImplementedError

    def prepare_inputs(self, x, s, c: dict, uc: dict):
        raise NotImplementedError


class VanillaCFG(Guider):
    """uncond/cond batch doubling + lerp by scale (guidance.py:20-40)."""

    def __init__(self, scale: float):
        self.scale = scale

    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)

    def prepare_inputs(self, x, s, c: dict, uc: dict):
        c_out = {}
        for k in c:
            if k in COND_KEYS:
                c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out


class IdentityGuider(Guider):
    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        return x

    def prepare_inputs(self, x, s, c: dict, uc: dict):
        return x, s, dict(c)


class LinearPredictionGuider(Guider):
    """Per-frame scale ramp for video batches (guidance.py:52-89)."""

    def __init__(
        self,
        max_scale: float,
        num_frames: int,
        min_scale: float = 1.0,
        additional_cond_keys: Sequence[str] = (),
    ):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.num_frames = num_frames
        self.scale = jnp.linspace(min_scale, max_scale, num_frames)[None, :]
        if isinstance(additional_cond_keys, str):
            additional_cond_keys = [additional_cond_keys]
        self.additional_cond_keys = list(additional_cond_keys)

    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        x_u, x_c = jnp.split(x, 2, axis=0)
        t = self.num_frames
        b = x_u.shape[0] // t
        x_u = x_u.reshape((b, t) + x_u.shape[1:])
        x_c = x_c.reshape((b, t) + x_c.shape[1:])
        scale = jnp.broadcast_to(self.scale, (b, t))
        scale = append_dims(scale, x_u.ndim)
        out = x_u + scale * (x_c - x_u)
        return out.reshape((b * t,) + out.shape[2:])

    def prepare_inputs(self, x, s, c: dict, uc: dict):
        keys = set(COND_KEYS) | set(self.additional_cond_keys)
        c_out = {}
        for k in c:
            if k in keys:
                c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out
