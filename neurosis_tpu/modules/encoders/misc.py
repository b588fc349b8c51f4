"""Misc embedders (parity: modules/encoders/{classed,lowscale}.py, embedding.py:186).

ClassEmbedder (class-conditional vector cond with ucg class), GaussianEncoder
(VAE-encoder embedder), LowScaleEncoder (noise-augmented low-res conditioning),
SpatialRescaler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurosis_tpu.diffusion.discretization import LegacyDDPMDiscretization
from neurosis_tpu.models.vae import Encoder
from neurosis_tpu.modules.distributions import diagonal_gaussian_regularize

from .embedding import AbstractEmbModel


class ClassEmbedder(AbstractEmbModel):
    """int class labels → embedding vector (classed.py:9-33). Table is exactly
    n_classes rows (matches nn.Embedding(n_classes, dim) so reference
    checkpoints load shape-identically); the last class (n_classes-1) doubles
    as the ucg/unconditional class per classed.py:28-32."""

    embed_dim: int = 512
    n_classes: int = 1000
    add_sequence_dim: bool = False

    @nn.compact
    def __call__(self, c: jax.Array) -> Tuple[jax.Array]:
        emb = nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c.astype(jnp.int32))
        if self.add_sequence_dim:
            emb = emb[:, None, :]
        return (emb,)

    def uncond_class(self) -> int:
        return self.n_classes - 1  # classed.py:28-32 ("one extra class for ucg")


class ClassEmbedderForMultiCond(ClassEmbedder):
    """ClassEmbedder accepting a list-valued batch entry (classed.py:35-44):
    embeds the first element. The reference mutates the batch dict in place
    and re-wraps its output in a list; our conditioner consumes embedder
    outputs as arrays, so the unwrap is the whole adaptation here."""

    def __call__(self, c) -> Tuple[jax.Array]:
        if isinstance(c, (list, tuple)):
            c = c[0]
        return super().__call__(c)


class GaussianEncoder(AbstractEmbModel):
    """VAE-encoder embedder: image → sampled latent tokens (metadata.py:39-54)."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2)
    num_res_blocks: int = 1
    z_channels: int = 4
    resolution: int = 256
    weight: float = 1.0
    flatten_output: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> Tuple[jax.Array]:
        moments = Encoder(
            ch=self.ch,
            ch_mult=list(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=[],
            resolution=self.resolution,
            z_channels=self.z_channels,
            name="encoder",
        )(x)
        z, _ = diagonal_gaussian_regularize(moments, rng, sample=rng is not None)
        if self.flatten_output:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return (z,)


class SpatialRescaler(AbstractEmbModel):
    """Multi-stage spatial down/up scaling with optional 1x1 remap (embedding.py:186)."""

    n_stages: int = 1
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: Optional[int] = None
    method: str = "bilinear"

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array]:
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            nh, nw = max(int(h * self.multiplier), 1), max(int(w * self.multiplier), 1)
            x = jax.image.resize(x, (b, nh, nw, c), method=self.method)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), name="channel_mapper")(x)
        return (x,)


class LowScaleEncoder(AbstractEmbModel):
    """Noise-augmented low-res conditioning (lowscale.py:14-100): downscale,
    VAE-encode, add schedule noise at a random (or fixed) augmentation level;
    returns (latent, noise_level) — concat + vector cond."""

    model: Optional[nn.Module] = None  # a first-stage AutoencoderKL-like module
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    timesteps: int = 1000
    max_noise_level: int = 250
    output_size: int = 64
    scale_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        if rng is None:
            noise_level = jnp.zeros((b,), jnp.int32)
            rng_noise = jax.random.PRNGKey(0)
        else:
            rng_level, rng_noise = jax.random.split(rng)
            noise_level = jax.random.randint(rng_level, (b,), 0, self.max_noise_level)

        if self.model is not None:
            moments = self.model.encode(x)
            z, _ = diagonal_gaussian_regularize(moments, None, sample=False)
        else:
            z = x
        z = z * self.scale_factor

        disc = LegacyDDPMDiscretization(
            linear_start=self.linear_start, linear_end=self.linear_end, num_timesteps=self.timesteps
        )
        alphas_cumprod = jnp.asarray(disc.alphas_cumprod, jnp.float32)
        a = alphas_cumprod[noise_level].reshape((b,) + (1,) * (z.ndim - 1))
        noise = jax.random.normal(rng_noise, z.shape, z.dtype)
        z_noisy = jnp.sqrt(a) * z + jnp.sqrt(1.0 - a) * noise

        if self.output_size is not None and z_noisy.shape[1] != self.output_size:
            b_, h, w, c = z_noisy.shape
            z_noisy = jax.image.resize(z_noisy, (b_, self.output_size, self.output_size, c), "nearest")
        return (z_noisy, noise_level)
