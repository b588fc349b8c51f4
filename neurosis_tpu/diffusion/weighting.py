"""Loss weightings w(sigma) for diffusion training.

Parity with the reference's ``modules/diffusion/denoiser_weighting.py`` (classes at
17/22/28/38/57/78). Pure elementwise jnp; the RF weightings compute in float64
upstream — on TPU we compute in float32 with a numerically equivalent formulation
(log-space) since x64 is disabled by default and the weights feed a float32 loss.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax import Array


class DenoiserWeighting:
    def __call__(self, sigma: Array) -> Array:
        raise NotImplementedError


class UnitWeighting(DenoiserWeighting):
    def __call__(self, sigma: Array) -> Array:
        return jnp.ones_like(sigma)


class EpsWeighting(DenoiserWeighting):
    def __call__(self, sigma: Array) -> Array:
        return sigma**-2.0


@dataclasses.dataclass
class EDMWeighting(DenoiserWeighting):
    sigma_data: float = 1.0

    def __call__(self, sigma: Array) -> Array:
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2


@dataclasses.dataclass
class RectifiedFlowWeighting(DenoiserWeighting):
    """CFM weight x logit-normal density over t = sigma/(1+sigma)."""

    m: float = 0.0
    s: float = 1.0

    def __call__(self, sigma: Array) -> Array:
        t = sigma / (1.0 + sigma)
        cfm_weights = 1.0 / (1.0 - t) ** 2
        half_pi = math.pi / 2.0
        pi_weights = (
            (1.0 / (self.s * math.sqrt(4.0 * half_pi)))
            * (1.0 / (t * (1.0 - t)))
            * jnp.exp(-0.5 * (jnp.log(sigma) - self.m) ** 2 / self.s**2)
        )
        return cfm_weights * pi_weights


@dataclasses.dataclass
class RectifiedFlowComfyWeighting(DenoiserWeighting):
    """Same as RectifiedFlowWeighting but sigma IS t in [0,1] (comfy convention)."""

    m: float = 0.0
    s: float = 1.0

    def __call__(self, sigma: Array) -> Array:
        t = sigma
        cfm_weights = 1.0 / (1.0 - t) ** 2
        half_pi = math.pi / 2.0
        pi_weights = (
            (1.0 / (self.s * math.sqrt(4.0 * half_pi)))
            * (1.0 / (t * (1.0 - t)))
            * jnp.exp(-0.5 * (jnp.log(t / (1.0 - t)) - self.m) ** 2 / self.s**2)
        )
        return cfm_weights * pi_weights


@dataclasses.dataclass
class MinSNRGammaModifier(DenoiserWeighting):
    """min-SNR-gamma wrapper: weight *= min(snr, gamma)/snr (or /(snr+1) for v-pred)."""

    weighting: DenoiserWeighting
    gamma: float = 5.0
    v_pred: bool = False

    def __call__(self, sigma: Array) -> Array:
        weights = self.weighting(sigma)
        snr = 1.0 / sigma**2
        snr_weight = jnp.minimum(snr, self.gamma)
        snr_weight = snr_weight / (snr + 1.0) if self.v_pred else snr_weight / snr
        return weights * snr_weight
