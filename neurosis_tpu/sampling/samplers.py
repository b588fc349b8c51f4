"""k-diffusion samplers in JAX (parity: modules/diffusion/sampling/sampling.py).

JAX redesign: each sampler builds its sigma schedule host-side (static
num_steps) and runs the step loop under `lax.fori_loop`, so the whole sampling
chain is ONE compiled program per (shape, num_steps) — no per-step dispatch.
Randomness (churn noise, ancestral noise) threads an explicit PRNG key through
the loop carry.

The denoiser callable has signature `denoise(x, sigma, cond) -> D-output`
(the engine's `denoiser_fn`); guiders wrap it with CFG batch-doubling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurosis_tpu.diffusion.discretization import Discretization, RectifiedFlowComfyDiscretization
from neurosis_tpu.utils import append_dims

from .guidance import Guider, IdentityGuider
from .utils import (
    default_noise_sampler,
    get_ancestral_step,
    linear_multistep_coeff,
    to_d,
    to_neg_log_sigma,
    to_sigma,
)

DenoiseFn = Callable[[jax.Array, jax.Array, dict], jax.Array]


class BaseDiffusionSampler:
    """prepare loop: σ table + x·√(1+σ₀²) (or x·σ₀ comfy-RF) (sampling.py:50-91)."""

    def __init__(
        self,
        discretization: Discretization,
        guider: Optional[Guider] = None,
        num_steps: Optional[int] = None,
        verbose: bool = False,
        rf_safeguard: bool = False,
        device: Optional[str] = None,  # accepted for config parity; unused in JAX
    ):
        self.discretization = discretization
        self.guider = guider if guider is not None else IdentityGuider()
        self.num_steps = num_steps
        self.verbose = verbose
        self._comfy_rf = isinstance(discretization, RectifiedFlowComfyDiscretization)
        self.rf_safeguard = rf_safeguard and self._comfy_rf

    def prepare(self, x: jax.Array, cond: dict, uc: Optional[dict], num_steps: Optional[int]):
        num_steps = num_steps if num_steps is not None else self.num_steps
        if num_steps is None:
            raise ValueError("Step count must be set at init or call time!")
        # host-side numpy table: schedule math (churn gammas, LMS coeffs,
        # the initial scale) stays concrete even under an outer jax.jit, so
        # a caller can jit the WHOLE sampling call once instead of paying a
        # full re-trace per invocation
        self._sigmas_np = self.discretization.table(num_steps)
        sigmas = jnp.asarray(self._sigmas_np)
        uc = uc if uc is not None else cond
        if self._comfy_rf:
            x = x * float(self._sigmas_np[0])
        else:
            x = x * float(np.sqrt(1.0 + self._sigmas_np[0] ** 2))
        # fp32 carry: the per-step sigma math runs fp32 regardless of the
        # latent dtype (the network input is cast to its own dtype by c_in)
        return x.astype(jnp.float32), sigmas, cond, uc

    def denoise(self, x: jax.Array, denoiser: DenoiseFn, sigma: jax.Array, cond: dict, uc: dict):
        xin, sin, cin = self.guider.prepare_inputs(x, sigma, cond, uc)
        denoised = denoiser(xin, sin, cin)
        denoised = self.guider(denoised, sigma)
        if self.rf_safeguard:
            # normalized-output hack near the transition phase (sampling.py:79-89)
            s = append_dims(sigma, x.ndim)
            alpha = 1.0 - s
            std = jnp.std(denoised / alpha, axis=tuple(range(1, denoised.ndim)))
            bad = (std < 0.5) | (std > 1.5)
            scale = jnp.where(bad, 1.0 / jnp.maximum(std, 1e-6), 1.0)
            denoised = denoised * append_dims(scale, denoised.ndim)
        return denoised

    def s_in(self, x: jax.Array) -> jax.Array:
        return jnp.ones((x.shape[0],), x.dtype)


class EDMSampler(BaseDiffusionSampler):
    """Euler/Heun EDM family with churn (sampling.py:140-207)."""

    def __init__(self, s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = float("inf"),
                 s_noise: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.s_churn = s_churn
        self.s_tmin = s_tmin
        self.s_tmax = s_tmax
        self.s_noise = s_noise

    def correction(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        return euler_step

    def __call__(
        self,
        denoiser: DenoiseFn,
        x: jax.Array,
        cond: dict,
        uc: Optional[dict] = None,
        num_steps: Optional[int] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        x, sigmas, cond, uc = self.prepare(x, cond, uc, num_steps)
        n = len(sigmas) - 1
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        s_in = self.s_in(x)
        # gammas are static per step (from the host-side table)
        gammas = jnp.asarray(
            [
                min(self.s_churn / n, 2**0.5 - 1) if self.s_tmin <= float(s) <= self.s_tmax else 0.0
                for s in self._sigmas_np[:-1]
            ],
            x.dtype,
        )

        def body(i, carry):
            x, key = carry
            key, nkey = jax.random.split(key)
            sigma = s_in * sigmas[i]
            next_sigma = s_in * sigmas[i + 1]
            gamma = gammas[i]
            sigma_hat = sigma * (gamma + 1.0)
            eps = jax.random.normal(nkey, x.shape, x.dtype) * self.s_noise
            bump = append_dims(jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)), x.ndim)
            x = x + eps * bump

            denoised = self.denoise(x, denoiser, sigma_hat, cond, uc)
            d = to_d(x, sigma_hat, denoised)
            dt = append_dims(next_sigma - sigma_hat, x.ndim)
            euler_step = x + dt * d
            x = self.correction(euler_step, x, d, dt, next_sigma, denoiser, cond, uc)
            return (x, key)

        x, _ = jax.lax.fori_loop(0, n, body, (x, rng))
        return x


class EulerEDMSampler(EDMSampler):
    pass


class HeunEDMSampler(EDMSampler):
    def correction(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        denoised = self.denoise(euler_step, denoiser, next_sigma, cond, uc)
        d_new = to_d(euler_step, next_sigma, denoised)
        d_prime = (d + d_new) / 2.0
        return jnp.where(append_dims(next_sigma, x.ndim) > 0.0, x + d_prime * dt, euler_step)


class AncestralSampler(BaseDiffusionSampler):
    def __init__(self, eta: float = 1.0, s_noise: float = 1.0, noise_sampler=None, **kwargs):
        """noise_sampler(key, shape, dtype) → noise; default = gaussian
        (sampling/utils.py:11 default_noise_sampler — injectable for custom
        noise schedules and exact-noise parity tests)."""
        super().__init__(**kwargs)
        self.eta = eta
        self.s_noise = s_noise
        self.noise_sampler = noise_sampler or default_noise_sampler

    def ancestral_euler_step(self, x, denoised, sigma, sigma_down):
        d = to_d(x, sigma, denoised)
        dt = append_dims(sigma_down - sigma, x.ndim)
        return x + dt * d

    def ancestral_step(self, x, key, sigma, next_sigma, sigma_up):
        noise = self.noise_sampler(key, x.shape, x.dtype)
        return jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0,
            x + noise * self.s_noise * append_dims(sigma_up, x.ndim),
            x,
        )

    def _loop(self, step_fn, denoiser, x, cond, uc, num_steps, rng):
        x, sigmas, cond, uc = self.prepare(x, cond, uc, num_steps)
        n = len(sigmas) - 1
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        s_in = self.s_in(x)

        def body(i, carry):
            x, key = carry
            key, nkey = jax.random.split(key)
            x = step_fn(s_in * sigmas[i], s_in * sigmas[i + 1], denoiser, x, cond, uc, nkey)
            return (x, key)

        x, _ = jax.lax.fori_loop(0, n, body, (x, rng))
        return x


class EulerAncestralSampler(AncestralSampler):
    """sampling.py:333-341."""

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        def step(sigma, next_sigma, denoiser, x, cond, uc, key):
            sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            x = self.ancestral_euler_step(x, denoised, sigma, sigma_down)
            return self.ancestral_step(x, key, sigma, next_sigma, sigma_up)

        return self._loop(step, denoiser, x, cond, uc, num_steps, rng)


class DPMPP2SAncestralSampler(AncestralSampler):
    """sampling.py:343-379."""

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        def step(sigma, next_sigma, denoiser, x, cond, uc, key):
            sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            x_euler = self.ancestral_euler_step(x, denoised, sigma, sigma_down)

            safe_down = jnp.maximum(sigma_down, 1e-20)
            t, t_next = to_neg_log_sigma(sigma), to_neg_log_sigma(safe_down)
            h = t_next - t
            s = t + 0.5 * h
            mult1 = append_dims(to_sigma(s) / to_sigma(t), x.ndim)
            mult2 = append_dims(jnp.expm1(-0.5 * h), x.ndim)
            mult3 = append_dims(to_sigma(t_next) / to_sigma(t), x.ndim)
            mult4 = append_dims(jnp.expm1(-h), x.ndim)

            x2 = mult1 * x - mult2 * denoised
            denoised2 = self.denoise(x2, denoiser, to_sigma(s), cond, uc)
            x_dpmpp2s = mult3 * x - mult4 * denoised2

            x = jnp.where(append_dims(sigma_down, x.ndim) > 0.0, x_dpmpp2s, x_euler)
            return self.ancestral_step(x, key, sigma, next_sigma, sigma_up)

        return self._loop(step, denoiser, x, cond, uc, num_steps, rng)


class DPMPP2MSampler(BaseDiffusionSampler):
    """Second-order multistep (sampling.py:381-458); old_denoised in the carry."""

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        x, sigmas, cond, uc = self.prepare(x, cond, uc, num_steps)
        n = len(sigmas) - 1
        s_in = self.s_in(x)

        def body(i, carry):
            x, old_denoised = carry
            sigma = s_in * sigmas[i]
            next_sigma = s_in * sigmas[i + 1]
            prev_sigma = s_in * sigmas[jnp.maximum(i - 1, 0)]

            denoised = self.denoise(x, denoiser, sigma, cond, uc)

            safe_next = jnp.maximum(next_sigma, 1e-20)
            t, t_next = to_neg_log_sigma(sigma), to_neg_log_sigma(safe_next)
            h = t_next - t
            mult1 = append_dims(to_sigma(t_next) / to_sigma(t), x.ndim)
            mult2 = append_dims(jnp.expm1(-h), x.ndim)

            x_standard = mult1 * x - mult2 * denoised

            h_last = t - to_neg_log_sigma(prev_sigma)
            # i==0 gives h_last=0 → r=0 → 1/(2r)=inf; x_advanced is discarded
            # there but inf*0=NaN would leak through the where — keep r safe.
            r = jnp.where(i > 0, h_last / h, jnp.ones_like(h))
            mult3 = 1 + 1 / (2 * r)
            mult4 = 1 / (2 * r)
            denoised_d = append_dims(mult3, x.ndim) * denoised - append_dims(mult4, x.ndim) * old_denoised
            x_advanced = mult1 * x - mult2 * denoised_d

            use_advanced = (i > 0) & (jnp.sum(next_sigma) >= 1e-14)
            x = jnp.where(use_advanced, x_advanced, x_standard)
            return (x, denoised)

        x, _ = jax.lax.fori_loop(0, n, body, (x, jnp.zeros_like(x)))
        return x


class LinearMultistepSampler(BaseDiffusionSampler):
    """LMS with host-side quadrature coefficients (sampling.py:274-311);
    unrolled python loop (coeffs differ per step)."""

    def __init__(self, order: int = 4, **kwargs):
        super().__init__(**kwargs)
        self.order = order

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        x, sigmas, cond, uc = self.prepare(x, cond, uc, num_steps)
        n = len(sigmas) - 1
        s_in = self.s_in(x)
        sigmas_np = self._sigmas_np  # host table (outer-jit safe)

        ds = []
        for i in range(n):
            sigma = s_in * sigmas[i]
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            d = to_d(x, sigma, denoised)
            ds.append(d)
            if len(ds) > self.order:
                ds.pop(0)
            cur_order = min(i + 1, self.order)
            coeffs = [linear_multistep_coeff(cur_order, sigmas_np, i, j) for j in range(cur_order)]
            x = x + sum(c * d_ for c, d_ in zip(coeffs, reversed(ds)))
        return x
