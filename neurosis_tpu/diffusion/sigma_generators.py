"""Train-time sigma samplers.

Parity with the reference's ``modules/diffusion/sampling/sigma_generators.py``
(EDM:17, Discrete:38, CosineSchedule:60, Tan:94, RectifiedFlow:121,
RectifiedFlowComfy:145), rewritten for explicit-PRNG JAX: each generator takes
either a pre-drawn ``t`` array (the loss draws one uniform t per sample and feeds
every generator from it, reference loss.py:116-120) or a PRNG key to draw its
native distribution itself.

Deviation (documented): the reference's ``DiscreteSigmaGenerator`` computes
``idx = t.long()`` when handed the loss's uniform t in [0,1), which collapses to
index 0 for every sample — plainly not the intended uniform-index sampling its
``t=None`` branch performs (``randint(0, num_idx)``). We implement the intent:
``idx = floor(t * num_idx)`` which is exactly uniform over indices.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import Array

from .discretization import Discretization


class SigmaGenerator:
    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        raise NotImplementedError

    def _require_t_or_rng(self, t: Array | None, rng: Array | None) -> None:
        if t is None and rng is None:
            raise ValueError(f"{type(self).__name__} needs either a pre-drawn t or a PRNG key")


@dataclasses.dataclass
class EDMSigmaGenerator(SigmaGenerator):
    """sigma = exp(p_mean + p_std * t) * scale; t ~ N(0,1) when drawn internally.

    Note: when the loss feeds its uniform t (reference loss.py:116-120), the
    reference uses that t directly in place of the normal draw; we preserve that.
    """

    p_mean: float = -1.2
    p_std: float = 1.2
    scale: float = 2.0

    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            t = jax.random.normal(rng, (n_samples,), dtype=jnp.float32)
        t = t.astype(jnp.float32)
        return jnp.exp(self.p_mean + self.p_std * t) * self.scale


class DiscreteSigmaGenerator(SigmaGenerator):
    """Uniform index into a discretization's sigma table.

    ``exclude_zero`` (default True, a documented deviation): the reference
    fork defaults ``do_append_zero=True`` (sigma_generators.py:43; upstream
    sgm uses False) and its ``Discretization.__call__`` honors only the
    constructor flag, so the flipped table is ``[0, sigma_min..sigma_max]``
    of length num_idx+1 and ``randint(0, num_idx)`` draws sigma=0 with
    p=1/num_idx. Under eps weighting (sigma^-2, denoiser_weighting.py) a
    sigma=0 draw evaluates 0*inf = NaN loss — a landmine we reproduced at
    step 196 of a 200-step seed-0 run. exclude_zero drops that leading zero,
    restoring upstream-sgm training semantics (all num_idx real sigmas
    drawable); set False for exact reference-fork behavior."""

    def __init__(
        self,
        discretization: Discretization,
        num_idx: int = 1000,
        do_append_zero: bool = True,
        flip: bool = True,
        exclude_zero: bool = True,
    ):
        self.num_idx = num_idx
        self.sigmas = discretization(num_idx, do_append_zero=do_append_zero, flip=flip)
        if exclude_zero and self.sigmas.shape[0] > num_idx and float(self.sigmas[0]) == 0.0:
            self.sigmas = self.sigmas[1:]

    def idx_to_sigma(self, idx: Array) -> Array:
        return self.sigmas[idx]

    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            idx = jax.random.randint(rng, (n_samples,), 0, self.num_idx)
        else:
            # fractional t in [0,1) -> uniform index (see module docstring);
            # integer-valued t >= 1 is treated as a direct index like the reference.
            t = t.astype(jnp.float32)
            idx = jnp.where(
                jnp.logical_and(t >= 0.0, t < 1.0),
                jnp.floor(t * self.num_idx),
                t,
            ).astype(jnp.int32)
            idx = jnp.clip(idx, 0, self.num_idx - 1)
        return self.idx_to_sigma(idx)


@dataclasses.dataclass
class CosineScheduleSigmaGenerator(SigmaGenerator):
    """iDDPM cosine schedule in logSNR space (reference sigma_generators.py:60-92)."""

    s: float = 0.008
    sigma_data: float = 1.0

    def __call__(
        self,
        n_samples: int,
        t: Array | None = None,
        *,
        rng: Array | None = None,
        shift: float = 1.0,
        return_logSNR: bool = False,
    ) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            t = jnp.clip(1.0 - jax.random.uniform(rng, (n_samples,)) + 0.001, 0.001, 1.0)
        t = t.astype(jnp.float32)
        s = self.s
        min_var = math.cos(s / (1 + s) * math.pi * 0.5) ** 2
        var = jnp.clip(jnp.cos((s + t) / (1 + s) * math.pi * 0.5), 0.0, 1.0) ** 2 / min_var
        var = 0.0001 + var * 0.9999
        logSNR = jnp.log(var / (1 - var))
        if shift != 1:
            logSNR = logSNR + 2 * math.log(1 / shift)
        if return_logSNR:
            return logSNR
        return jnp.exp(-logSNR / 2) * self.sigma_data


@dataclasses.dataclass
class TanScheduleSigmaGenerator(SigmaGenerator):
    start_shift: float = 0.001
    end_shift: float = 0.001
    scale: float = 1.0
    clip: bool = True

    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            t = jax.random.uniform(rng, (n_samples,))
        t = t.astype(jnp.float32)
        half_pi = math.pi / 2.0
        half_pi_t = half_pi * t
        if self.clip:
            half_pi_t = jnp.clip(half_pi_t, self.start_shift, half_pi - self.end_shift)
        return (jnp.tan(half_pi_t) * self.scale).astype(jnp.float32)


@dataclasses.dataclass
class RectifiedFlowSigmaGenerator(SigmaGenerator):
    """sigma = t/(1-t), t ~ U[start_shift, 1-end_shift]."""

    start_shift: float = 0.0
    end_shift: float = 0.001
    clip: bool = True

    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            t = jax.random.uniform(rng, (n_samples,))
        t = t.astype(jnp.float32)
        if self.clip:
            t = jnp.clip(t, self.start_shift, 1.0 - self.end_shift)
        return (t / (1.0 - t)).astype(jnp.float32)


@dataclasses.dataclass
class RectifiedFlowComfySigmaGenerator(SigmaGenerator):
    """sigma = t in [start_shift, 1-end_shift] (comfy convention)."""

    start_shift: float = 0.0
    end_shift: float = 0.001
    clip: bool = True

    def __call__(self, n_samples: int, t: Array | None = None, *, rng: Array | None = None) -> Array:
        self._require_t_or_rng(t, rng)
        if t is None:
            t = jax.random.uniform(rng, (n_samples,))
        t = t.astype(jnp.float32)
        if self.clip:
            t = jnp.clip(t, self.start_shift, 1.0 - self.end_shift)
        return t
