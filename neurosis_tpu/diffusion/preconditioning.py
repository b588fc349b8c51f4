"""Denoiser preconditionings — EDM-style sigma → (c_skip, c_out, c_in, c_noise).

Pure, stateless, jittable. Behavioral parity with the reference's
``modules/diffusion/denoiser_preconditioning.py`` (classes at lines 33/47/55/60/77/93),
re-expressed as jnp math.

All functions operate elementwise on a sigma array of any shape (the caller
broadcasts it against the latent batch; see :mod:`neurosis_tpu.diffusion.denoiser`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array


class DenoiserPreconditioning:
    """Base: maps sigma to the four preconditioning coefficients.

    ``__call__(sigma) -> (c_skip, c_out, c_in, c_noise)``; the denoised estimate is
    ``D(x; sigma) = network(x * c_in, c_noise) * c_out + x * c_skip``.
    """

    def __call__(self, sigma: Array) -> tuple[Array, Array, Array, Array]:
        return (
            self.get_c_skip(sigma),
            self.get_c_out(sigma),
            self.get_c_in(sigma),
            self.get_c_noise(sigma),
        )

    def get_c_skip(self, sigma: Array) -> Array:
        raise NotImplementedError

    def get_c_out(self, sigma: Array) -> Array:
        raise NotImplementedError

    def get_c_in(self, sigma: Array) -> Array:
        raise NotImplementedError

    def get_c_noise(self, sigma: Array) -> Array:
        raise NotImplementedError

    def get_snr(self, sigma: Array) -> Array:
        # assumes unit-variance data
        return 1.0 / sigma**2


class EpsPreconditioning(DenoiserPreconditioning):
    """Epsilon-prediction (SD 1.x): c_skip=1, c_out=-sigma, c_in=1/sqrt(sigma^2+1), c_noise=sigma."""

    def get_c_skip(self, sigma: Array) -> Array:
        return jnp.ones_like(sigma)

    def get_c_out(self, sigma: Array) -> Array:
        return -sigma

    def get_c_in(self, sigma: Array) -> Array:
        return 1.0 / jnp.sqrt(sigma**2 + 1.0)

    def get_c_noise(self, sigma: Array) -> Array:
        return sigma


class VPreconditioning(EpsPreconditioning):
    """v-prediction: c_skip=1/(sigma^2+1), c_out=-sigma/sqrt(sigma^2+1)."""

    def get_c_skip(self, sigma: Array) -> Array:
        return 1.0 / (sigma**2 + 1.0)

    def get_c_out(self, sigma: Array) -> Array:
        return -sigma / jnp.sqrt(sigma**2 + 1.0)


class VPreconditioningWithEDMcNoise(VPreconditioning):
    """v-prediction with EDM continuous c_noise = log(sigma)/4."""

    def get_c_noise(self, sigma: Array) -> Array:
        return 0.25 * jnp.log(sigma)


@dataclasses.dataclass
class EDMPreconditioning(DenoiserPreconditioning):
    """Karras EDM preconditioning with data std ``sigma_data``."""

    sigma_data: float = 1.0

    def get_c_skip(self, sigma: Array) -> Array:
        return self.sigma_data**2 / (sigma**2 + self.sigma_data**2)

    def get_c_out(self, sigma: Array) -> Array:
        return sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def get_c_in(self, sigma: Array) -> Array:
        return 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def get_c_noise(self, sigma: Array) -> Array:
        return 0.25 * jnp.log(sigma)


class RectifiedFlowXLPreconditioning(DenoiserPreconditioning):
    """Rectified flow, sigma = t/(1-t) parameterisation (sd3-style timestep scaling)."""

    def get_c_skip(self, sigma: Array) -> Array:
        return jnp.ones_like(sigma)

    def get_c_out(self, sigma: Array) -> Array:
        return -sigma

    def get_c_in(self, sigma: Array) -> Array:
        s_t = 1.0 / (1.0 + sigma)
        noise_std = jnp.sqrt((1.0 / (sigma + 1.0)) ** 2 + (sigma / (sigma + 1.0)) ** 2)
        return s_t / noise_std

    def get_c_noise(self, sigma: Array) -> Array:
        return 1000.0 * (sigma / (1.0 + sigma))


class RectifiedFlowComfyPreconditioning(DenoiserPreconditioning):
    """Rectified flow, sigma = t in [0,1] parameterisation (comfy convention)."""

    def get_c_skip(self, sigma: Array) -> Array:
        return jnp.ones_like(sigma)

    def get_c_out(self, sigma: Array) -> Array:
        return -sigma

    def get_c_in(self, sigma: Array) -> Array:
        return 1.0 / jnp.sqrt(sigma**2 + (1.0 - sigma) ** 2)

    def get_c_noise(self, sigma: Array) -> Array:
        return 1000.0 * sigma
