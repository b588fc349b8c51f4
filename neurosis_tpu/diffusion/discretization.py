"""Sigma-table discretizations.

Parity with the reference's ``modules/diffusion/discretization.py`` (EDMc:43,
EDMcSimple:61, RectifiedFlow:86, RectifiedFlowComfy:97, TanZeroSNR:109, EDM:127,
LegacyDDPM:149). Tables are built **on host in numpy (float64 where the reference
uses it)** once at setup time and returned as float32 jnp constants — they are
static inputs to the jitted train/sample steps, so there is no reason to trace
their construction.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
from jax import Array


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """DDPM beta schedules (reference: modules/diffusion/util.py:22-52)."""
    if schedule == "linear":
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


@dataclasses.dataclass
class Discretization:
    """Base: ``__call__(n)`` returns a descending sigma table (largest first),
    optionally with a trailing zero appended, as a float32 jnp array."""

    do_append_zero: bool = True

    def table(self, n: int, flip: bool = False) -> np.ndarray:
        """Host-side (numpy) sigma table — pure config math. Samplers use this
        for schedule decisions (churn gammas, LMS coefficients) so the whole
        sampling loop stays traceable under an outer jax.jit."""
        sigmas = self.get_sigmas(n)
        # The reference's __call__ accepts a do_append_zero arg but only honors the
        # constructor flag (discretization.py:22-35); we mirror that contract.
        if self.do_append_zero:
            sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=sigmas.dtype)])
        if flip:
            sigmas = sigmas[::-1]
        return np.ascontiguousarray(sigmas).astype(np.float32)

    def __call__(self, n: int, do_append_zero: bool | None = None, flip: bool = False) -> Array:
        return jnp.asarray(self.table(n, flip=flip))

    def get_sigmas(self, n: int) -> np.ndarray:
        raise NotImplementedError


@dataclasses.dataclass
class EDMcDiscretization(Discretization):
    """Log-linear sigma ramp in [sigma_min, sigma_max], descending."""

    sigma_min: float = 0.001
    sigma_max: float = 1000.0

    def get_sigmas(self, n: int) -> np.ndarray:
        sigmas = np.exp(np.linspace(math.log(self.sigma_min), math.log(self.sigma_max), n, dtype=np.float32))
        return sigmas[::-1]


@dataclasses.dataclass
class EDMcSimpleDiscretization(Discretization):
    """Subsample a num_sigmas log-linear table by strided back-indexing, plus 0."""

    sigma_min: float = 0.001
    sigma_max: float = 1000.0
    num_sigmas: int = 1000

    def get_sigmas(self, n: int) -> np.ndarray:
        table = np.exp(
            np.linspace(math.log(self.sigma_min), math.log(self.sigma_max), self.num_sigmas, dtype=np.float32)
        )
        ss = len(table) / n
        sigs = [float(table[-(1 + int(x * ss))]) for x in range(n)]
        sigs.append(0.0)
        return np.asarray(sigs, dtype=np.float32)


@dataclasses.dataclass
class RectifiedFlowDiscretization(Discretization):
    do_append_zero: bool = False
    start_shift: float = 0.0
    end_shift: float = 0.001

    def __init__(self, start_shift: float = 0.0, end_shift: float = 0.001, do_append_zero: bool = False):
        super().__init__(do_append_zero=do_append_zero)
        self.start_shift = start_shift
        self.end_shift = end_shift

    def get_sigmas(self, n: int) -> np.ndarray:
        t = np.linspace(self.start_shift, 1 - self.end_shift, n, dtype=np.float64)
        sigmas = t / (1.0 - t)
        return sigmas[::-1].astype(np.float32)


@dataclasses.dataclass
class RectifiedFlowComfyDiscretization(Discretization):
    do_append_zero: bool = False
    start_shift: float = 0.0
    end_shift: float = 0.001

    def __init__(self, start_shift: float = 0.0, end_shift: float = 0.001, do_append_zero: bool = False):
        super().__init__(do_append_zero=do_append_zero)
        self.start_shift = start_shift
        self.end_shift = end_shift

    def get_sigmas(self, n: int) -> np.ndarray:
        sigmas = np.linspace(self.start_shift, 1 - self.end_shift, n, dtype=np.float64)
        return sigmas[::-1].astype(np.float32)


@dataclasses.dataclass
class TanZeroSNRDiscretization(Discretization):
    """tan ramp to +inf at t=pi/2 (zero-terminal-SNR); float64 internally."""

    start_shift: float = 0.001
    end_shift: float = 0.001
    scale: float = 1.0

    def __init__(self, start_shift: float = 0.001, end_shift: float = 0.001, scale: float = 1.0):
        super().__init__(do_append_zero=True)
        self.start_shift = start_shift
        self.end_shift = end_shift
        self.scale = scale

    def get_sigmas(self, n: int) -> np.ndarray:
        half_pi = np.arccos(np.zeros(1, dtype=np.float64))[0]
        sigmas = np.tan(np.linspace(self.start_shift, half_pi - self.end_shift, n, dtype=np.float64)) * self.scale
        return sigmas[::-1].astype(np.float32)


@dataclasses.dataclass
class EDMDiscretization(Discretization):
    """Karras rho-ramp; already descending."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0

    def __init__(self, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0):
        super().__init__(do_append_zero=True)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.rho = rho

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n, dtype=np.float32)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        return ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho).astype(np.float32)


@dataclasses.dataclass
class LegacyDDPMDiscretization(Discretization):
    """DDPM beta-schedule -> alpha-bar -> sigma table, descending."""

    linear_start: float = 0.00085
    linear_end: float = 0.0120
    num_timesteps: int = 1000

    def __init__(self, linear_start: float = 0.00085, linear_end: float = 0.0120, num_timesteps: int = 1000):
        super().__init__(do_append_zero=True)
        self.linear_start = linear_start
        self.linear_end = linear_end
        self.num_timesteps = num_timesteps
        alphas = 1.0 - make_beta_schedule("linear", num_timesteps, linear_start, linear_end)
        self.alphas_cumprod = np.cumprod(alphas, axis=0).astype(np.float32)

    def get_sigmas(self, n: int) -> np.ndarray:
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(f"n ({n}) must be <= num_timesteps ({self.num_timesteps})")
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        return sigmas[::-1].astype(np.float32)
