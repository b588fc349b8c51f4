"""Standard diffusion training loss.

Parity with the reference's ``modules/diffusion/loss.py`` (DiffusionLoss:20,
StandardDiffusionLoss:71), functionalised for JAX: the conditioner runs outside
(in the engine's train step, where its params live), and all randomness — the
per-sample timestep draw, the noise, and the noise-offset chance — comes from an
explicit PRNG key so the whole loss is jittable and reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..losses.functions import batch_l1_loss, batch_mse_loss
from ..utils import append_dims
from .denoiser import Denoiser
from .sigma_generators import SigmaGenerator
from .weighting import DenoiserWeighting


class StandardDiffusionLoss:
    def __init__(
        self,
        sigma_generator: SigmaGenerator,
        loss_weighting: DenoiserWeighting,
        loss_type: str = "l2",
        snr_gamma: float = 0.0,
        noise_offset: float = 0.0,
        noise_offset_chance: float = 0.0,
        input_keys: str | list[str] = (),
        objective_type: str = "edm",
    ):
        self.sigma_generator = sigma_generator
        self.loss_weighting = loss_weighting
        self.snr_gamma = snr_gamma
        self.noise_offset = min(max(noise_offset, 0.0), 1.0)
        self.noise_offset_chance = min(max(noise_offset_chance, 0.0), 1.0)
        self.objective_type = str(objective_type).lower()
        if self.objective_type not in ("edm", "rf"):
            raise ValueError(f"unknown objective type {objective_type!r}")

        loss_type = str(loss_type).lower()
        if loss_type == "l1":
            self.loss_type = "l1"
            self.loss = batch_l1_loss
        elif loss_type in ("l2", "mse"):
            self.loss_type = "l2"
            self.loss = batch_mse_loss
        else:
            raise ValueError(f"unknown loss type {loss_type!r}")

        if isinstance(input_keys, str):
            input_keys = [input_keys]
        self.input_keys = set(input_keys)

    def apply_noise_offset(self, rng: Array, noise: Array, inputs: Array) -> Array:
        """Channelwise noise offset, applied with probability ``noise_offset_chance``
        (reference loss.py:32-40) — jittable via bernoulli + where."""
        if self.noise_offset <= 0:
            return noise
        chance_rng, offset_rng = jax.random.split(rng)
        offset = jax.random.normal(
            offset_rng, inputs.shape[:2] + (1,) * (inputs.ndim - 2), dtype=noise.dtype
        )
        offset_noise = noise + self.noise_offset * offset
        if self.noise_offset_chance >= 1.0:
            return offset_noise
        take = jax.random.bernoulli(chance_rng, self.noise_offset_chance)
        return jnp.where(take, offset_noise, noise)

    def __call__(
        self,
        network_apply,
        denoiser: Denoiser,
        cond: dict,
        inputs: Array,
        rng: Array,
        batch: dict | None = None,
        return_dict: bool = False,
    ):
        """Returns per-sample weighted loss (B,) — the engine takes the mean.

        Mirrors reference loss.py:105-158: draw t~U per sample, map through the
        sigma generator, noise the latents per objective, run the preconditioned
        network, and weight the batch-reduced L1/L2.
        """
        batch = batch or {}
        extra_inputs = {k: batch[k] for k in batch if k in self.input_keys}
        b = inputs.shape[0]

        t_rng, noise_rng, offset_rng = jax.random.split(rng, 3)
        t = jax.random.uniform(t_rng, (b,), dtype=jnp.float32)
        sigmas = self.sigma_generator(b, t).astype(inputs.dtype)
        noise = jax.random.normal(noise_rng, inputs.shape, dtype=inputs.dtype)
        noise = self.apply_noise_offset(offset_rng, noise, inputs)
        sigmas_bc = append_dims(sigmas, inputs.ndim)

        if self.objective_type == "rf":
            alpha = 1.0 - sigmas_bc
            z_t = alpha * inputs + sigmas_bc * noise
            eps_output = denoiser(network_apply, z_t, sigmas, cond, "F", **extra_inputs)
            weight = self.loss_weighting(sigmas)
            loss = self.get_loss(eps_output, noise, weight)
        else:  # edm
            z_t = inputs + sigmas_bc * noise
            d_output = denoiser(network_apply, z_t, sigmas, cond, "D", **extra_inputs)
            weight = self.loss_weighting(sigmas)
            loss = self.get_loss(d_output, inputs, weight)

        if return_dict:
            return loss, {"sigmas": sigmas, "t": t}
        return loss

    def get_loss(self, outputs: Array, target: Array, weight: Array) -> Array:
        return self.loss(outputs.astype(jnp.float32), target.astype(jnp.float32)) * weight.astype(
            jnp.float32
        )
