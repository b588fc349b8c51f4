"""Latent distributions (parity: modules/distributions.py:9-28, regularizers.py:23-60).

Pure-functional: sampling takes an explicit PRNG key (JAX idiom) instead of
torch's global RNG.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    """mean/logvar split of a 2C-channel VAE moment tensor (channel-last)."""

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array, clip: bool = True) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if clip:
            logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean, logvar)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        """KL per batch element, summed over all non-batch dims (torch parity)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + jnp.exp(self.logvar) - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / jnp.exp(other.logvar)
            + jnp.exp(self.logvar - other.logvar)
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / jnp.exp(self.logvar),
            axis=axes,
        )


def diagonal_gaussian_regularize(
    moments: jax.Array, key: Optional[jax.Array] = None, sample: bool = True
) -> Tuple[jax.Array, dict]:
    """DiagonalGaussianRegularizer (modules/regularizers.py:23-60): returns
    (z, {'kl_loss': scalar}). sample=False → posterior mode."""
    dist = DiagonalGaussian.from_moments(moments)
    z = dist.sample(key) if sample else dist.mode()
    kl = jnp.mean(dist.kl())
    return z, {"kl_loss": kl}
