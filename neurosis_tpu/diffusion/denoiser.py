"""Denoiser wrappers — preconditioned network calls.

Parity with the reference's ``modules/diffusion/denoiser.py`` (Denoiser:15,
DiscreteDenoiser:60), functionalised: instead of wrapping an ``nn.Module``, the
denoiser takes ``network_apply`` — any callable ``(x, c_noise, cond, **extra) -> out``
(typically a partial of ``model.apply`` closing over params) — so the same object
works inside jitted train and sample steps.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..utils import append_dims
from .discretization import Discretization
from .preconditioning import DenoiserPreconditioning


class Denoiser:
    def __init__(self, preconditioning: DenoiserPreconditioning):
        self.preconditioning = preconditioning

    def possibly_quantize_sigma(self, sigma: Array) -> Array:
        return sigma

    def possibly_quantize_c_noise(self, c_noise: Array) -> Array:
        return c_noise

    def __call__(
        self,
        network_apply,
        inputs: Array,
        sigma: Array,
        cond: dict,
        output_mode: str = "D",
        **additional_model_inputs,
    ) -> Array:
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma_bc = append_dims(sigma, inputs.ndim)

        c_skip, c_out, c_in, c_noise = self.preconditioning(sigma_bc)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        c_in = c_in.astype(inputs.dtype)
        c_out = c_out.astype(inputs.dtype)
        c_skip = c_skip.astype(inputs.dtype)

        net_outputs = network_apply(inputs * c_in, c_noise, cond, **additional_model_inputs)
        if output_mode == "F":
            return net_outputs
        return net_outputs * c_out + inputs * c_skip


class DiscreteDenoiser(Denoiser):
    """Quantizes sigma to the nearest entry of a registered table; c_noise becomes
    the table index when ``quantize_c_noise`` (SD-style integer timesteps)."""

    def __init__(
        self,
        preconditioning: DenoiserPreconditioning,
        num_idx: int,
        discretization: Discretization,
        do_append_zero: bool = False,
        quantize_c_noise: bool = True,
        flip: bool = False,
    ):
        super().__init__(preconditioning)
        self.num_idx = num_idx
        self.quantize_c_noise = quantize_c_noise
        sigmas = discretization(num_idx, do_append_zero=do_append_zero, flip=flip)
        self.sigmas = sigmas
        self.log_sigmas = jnp.log(sigmas)

    def sigma_to_idx(self, sigma: Array) -> Array:
        dists = sigma - self.sigmas[(slice(None),) + (None,) * sigma.ndim]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx: Array) -> Array:
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma: Array) -> Array:
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise: Array) -> Array:
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise)
        return c_noise
