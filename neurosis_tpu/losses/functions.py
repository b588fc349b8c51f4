"""Elementary loss functions (reference: modules/losses/functions.py:21-111).

All "batch" losses reduce every dim except the leading batch dim, returning a
(B,) vector so per-sample weights can multiply before the final mean.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _reduce_all_but_batch(x: Array, reduction: str = "mean") -> Array:
    axes = tuple(range(1, x.ndim))
    if reduction == "mean":
        return jnp.mean(x, axis=axes)
    if reduction == "sum":
        return jnp.sum(x, axis=axes)
    raise ValueError(f"unknown reduction {reduction!r}")


def batch_l1_loss(outputs: Array, target: Array, reduction: str = "mean") -> Array:
    return _reduce_all_but_batch(jnp.abs(outputs - target), reduction)


def batch_mse_loss(outputs: Array, target: Array, reduction: str = "mean") -> Array:
    return _reduce_all_but_batch((outputs - target) ** 2, reduction)


def batch_nll_loss(recon: Array, target: Array, logvar: Array | float = 0.0, reduction: str = "mean") -> Array:
    """Gaussian NLL per-sample: |x - x_hat| scaled by exp(-logvar) + logvar."""
    nll = jnp.abs(recon - target) / jnp.exp(logvar) + logvar
    return _reduce_all_but_batch(nll, reduction)


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    """Hinge GAN discriminator loss (reference functions.py:21-33)."""
    loss_real = jnp.mean(jnp.maximum(0.0, 1.0 - logits_real))
    loss_fake = jnp.mean(jnp.maximum(0.0, 1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    """Non-saturating BCE-style discriminator loss via softplus (functions.py:36-48)."""
    return 0.5 * (jnp.mean(jnp.logaddexp(0.0, -logits_real)) + jnp.mean(jnp.logaddexp(0.0, logits_fake)))


def get_discr_loss_fn(name: str):
    """Factory (reference functions.py:51-62)."""
    name = str(name).lower()
    if name == "hinge":
        return hinge_d_loss
    if name == "vanilla":
        return vanilla_d_loss
    raise ValueError(f"unknown discriminator loss {name!r}")
