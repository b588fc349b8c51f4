"""Latent regularizers (parity: modules/regularizers.py + autoencoding/regularizers/).

DiagonalGaussian/Identity + the VQ family. All NHWC; quantizers use the
straight-through estimator (stop_gradient) exactly like the torch versions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import diagonal_gaussian_regularize


class IdentityRegularizer:
    """modules/regularizers.py IdentityRegularizer."""

    def __call__(self, z: jax.Array, rng=None) -> Tuple[jax.Array, dict]:
        return z, {}


class DiagonalGaussianRegularizer:
    """modules/regularizers.py:23-60; sample=False → mode."""

    def __init__(self, sample: bool = True):
        self.sample = sample

    def __call__(self, moments: jax.Array, rng: Optional[jax.Array] = None) -> Tuple[jax.Array, dict]:
        return diagonal_gaussian_regularize(moments, rng, sample=self.sample and rng is not None)


class VectorQuantizer(nn.Module):
    """VQ-VAE bottleneck (quantize.py:162-290): nearest-codebook assignment,
    commitment loss β·||z − sg[e]||² + ||sg[z] − e||², straight-through."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    log_perplexity: bool = False
    loss_key: str = "loss/vq"

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(k, s, minval=-1.0 / self.n_e, maxval=1.0 / self.n_e),
            (self.n_e, self.e_dim),
        )

    def get_codebook_entry(self, indices: jax.Array, shape=None) -> jax.Array:
        """indices → codebook vectors [..., e_dim] (quantize.py:292-318);
        AEIntegerWrapper's decode path."""
        h = self.embedding[indices]
        if shape is not None:
            h = h.reshape(shape)
        return h

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, dict]:
        emb = self.embedding
        shape = z.shape
        zf = z.reshape(-1, self.e_dim)
        d = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            + jnp.sum(emb**2, axis=1)
            - 2.0 * zf @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(shape)

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        # straight-through
        z_q = z + jax.lax.stop_gradient(z_q - z)

        log = {self.loss_key: loss}
        if self.log_perplexity:
            onehot = jax.nn.one_hot(idx, self.n_e)
            probs = jnp.mean(onehot, axis=0)
            log["perplexity"] = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
        log["indices"] = idx.reshape(shape[:-1])
        log["min_encoding_indices"] = log["indices"]  # reference key (quantize.py:282)
        return z_q, log


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax VQ (quantize.py:59-160): soft assignment during training,
    hard at eval; KL-to-uniform regularization."""

    n_e: int
    e_dim: int
    num_hiddens: int
    straight_through: bool = True
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(
        self, z: jax.Array, rng: Optional[jax.Array] = None, temp: Optional[float] = None,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, dict]:
        temp = temp or self.temp_init
        emb = self.param("embed.weight", nn.initializers.normal(1.0), (self.n_e, self.e_dim))
        logits = nn.Dense(self.n_e, name="proj")(z)

        if deterministic or rng is None:
            soft = jax.nn.softmax(logits / temp, axis=-1)
            idx = jnp.argmax(logits, axis=-1)
            hard = jax.nn.one_hot(idx, self.n_e)
            assign = hard if self.straight_through else soft
        else:
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
            soft = jax.nn.softmax((logits + gumbel) / temp, axis=-1)
            idx = jnp.argmax(soft, axis=-1)
            if self.straight_through:
                hard = jax.nn.one_hot(idx, self.n_e)
                assign = hard + soft - jax.lax.stop_gradient(soft)
            else:
                assign = soft

        z_q = assign @ emb
        probs = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(jnp.sum(probs * jnp.log(probs * self.n_e + 1e-10), axis=-1))
        return z_q, {self.loss_key: kl, "indices": idx}


class EMAVectorQuantizer(nn.Module):
    """EMA-codebook VQ (quantize.py:321-410): codebook updated by EMA of
    assigned latents instead of gradients (mutable 'ema_stats' collection)."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> Tuple[jax.Array, dict]:
        emb = self.variable("ema_stats", "embedding", lambda: jnp.zeros((self.n_e, self.e_dim)))
        cluster_size = self.variable("ema_stats", "cluster_size", lambda: jnp.zeros((self.n_e,)))
        emb_avg = self.variable("ema_stats", "embed_avg", lambda: jnp.zeros((self.n_e, self.e_dim)))

        shape = z.shape
        zf = z.reshape(-1, self.e_dim)
        d = jnp.sum(zf**2, 1, keepdims=True) + jnp.sum(emb.value**2, 1) - 2 * zf @ emb.value.T
        idx = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(idx, self.n_e)
        z_q = emb.value[idx].reshape(shape)

        if train and not self.is_initializing():
            n = jnp.sum(onehot, axis=0)
            dw = onehot.T @ zf
            cluster_size.value = self.decay * cluster_size.value + (1 - self.decay) * n
            emb_avg.value = self.decay * emb_avg.value + (1 - self.decay) * dw
            total = jnp.sum(cluster_size.value)
            cs = (cluster_size.value + self.eps) / (total + self.n_e * self.eps) * total
            emb.value = emb_avg.value / cs[:, None]

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, {self.loss_key: loss, "indices": idx.reshape(shape[:-1])}


class VectorQuantizerWithInputProjection(nn.Module):
    """VQ with in/out projections (quantize.py:412-461): project the encoder
    features to the codebook dim, quantize, optionally project back out.

    NHWC-native: 4D input [B,H,W,C] is flattened to tokens, quantized, and
    (when output_dim is set) restored to [B,H,W,output_dim] — the reference's
    channel-first rearranges collapse to plain reshapes here.
    """

    input_dim: int
    n_codes: int
    codebook_dim: int
    beta: float = 1.0
    output_dim: Optional[int] = None
    log_perplexity: bool = False
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, dict]:
        in_shape = z.shape
        rearr = False
        if z.ndim > 3:  # [B, ..., C] → [B, tokens, C]
            rearr = self.output_dim is not None
            z = z.reshape(in_shape[0], -1, in_shape[-1])
        z = nn.Dense(self.codebook_dim, name="proj_in")(z)
        z_q, log = VectorQuantizer(
            n_e=self.n_codes,
            e_dim=self.codebook_dim,
            beta=self.beta,
            log_perplexity=self.log_perplexity,
            loss_key=self.loss_key,
            name="quantizer",
        )(z)
        if self.output_dim is not None:
            z_q = nn.Dense(self.output_dim, name="proj_out")(z_q)
        if rearr:
            z_q = z_q.reshape(in_shape[:-1] + (z_q.shape[-1],))
        return z_q, log
