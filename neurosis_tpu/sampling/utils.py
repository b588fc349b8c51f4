"""Sampler math utilities (parity: modules/diffusion/sampling/utils.py:18-95)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from neurosis_tpu.utils import append_dims, append_zero


def to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    """Denoiser output → Karras ODE derivative."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def to_neg_log_sigma(sigma: jax.Array) -> jax.Array:
    return -jnp.log(sigma)


def to_sigma(neg_log_sigma: jax.Array) -> jax.Array:
    return jnp.exp(-neg_log_sigma)


def default_noise_sampler(key: jax.Array, shape, dtype=None) -> jax.Array:
    """Gaussian noise source for ancestral samplers (sampling/utils.py:11):
    the JAX analog takes (key, shape, dtype) instead of closing over x."""
    return jax.random.normal(key, shape, dtype or jnp.float32)


def get_ancestral_step(sigma_from: jax.Array, sigma_to: jax.Array, eta: float = 1.0):
    """(sigma_down, sigma_up) for ancestral steps (utils.py:33-43)."""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / jnp.maximum(sigma_from**2, 1e-20)),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def linear_multistep_coeff(order: int, t: np.ndarray, i: int, j: int, epsrel: float = 1e-4) -> float:
    """LMS integration coefficient via quadrature (utils.py:18-30); host-side."""
    from scipy import integrate

    if order - 1 > i:
        raise ValueError(f"Order {order} too high for step {i}")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=epsrel)[0]


def get_sigmas_karras(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0) -> jax.Array:
    ramp = jnp.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return append_zero((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho)


def get_sigmas_exponential(n: int, sigma_min: float, sigma_max: float) -> jax.Array:
    return append_zero(jnp.exp(jnp.linspace(math.log(sigma_max), math.log(sigma_min), n)))


def get_sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float, rho: float = 1.0) -> jax.Array:
    ramp = jnp.linspace(1, 0, n) ** rho
    return append_zero(jnp.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min)))


def get_sigmas_vp(n: int, beta_d: float = 19.9, beta_min: float = 0.1, eps_s: float = 1e-3) -> jax.Array:
    t = jnp.linspace(1, eps_s, n)
    return append_zero(jnp.sqrt(jnp.exp(beta_d * t**2 / 2 + beta_min * t) - 1))
