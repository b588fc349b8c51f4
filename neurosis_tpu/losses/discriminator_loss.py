"""sgm-style GeneralLPIPSWithDiscriminator (parity: autoencoding/losses/discriminator_loss.py:22-323).

Differences from AutoencoderLPIPSWithDiscr (vae_loss.py): learnable scalar
`logvar` NLL weighting, regularization_weights passthrough (KL/VQ terms from
the regularizer log), and the taming-transformers ADAPTIVE generator weight
d_weight = ‖∂nll/∂last_layer‖ / (‖∂g/∂last_layer‖ + 1e-4).

JAX adaptation of the adaptive weight: torch differentiates w.r.t. the decoder
conv_out tensor mid-graph; here the engine computes the two last-layer grads
with dedicated vjps (`adaptive_disc_weight` helper) and passes the resulting
scalar in — the module itself stays a pure function.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .functions import get_discr_loss_fn
from .lpips import LPIPS
from .patchgan import NLayerDiscriminator


class GeneralLPIPSWithDiscriminator(nn.Module):
    disc_start: int = -1
    logvar_init: float = 0.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"
    rec_weight: float = 1.0
    rec_loss_type: str = "l1"
    learn_logvar: bool = False
    regularization_weights: Optional[Mapping[str, float]] = None
    lpips_type: str = "vgg"

    def setup(self):
        self.logvar = self.param("logvar", nn.initializers.constant(self.logvar_init), ())
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels, n_layers=self.disc_num_layers, name="discriminator"
        )
        if self.perceptual_weight > 0:
            self.perceptual_loss = LPIPS(pnet_type=self.lpips_type, name="perceptual_loss")

    def _disc_start(self) -> int:
        # int32-safe 'never' sentinel: sys.maxsize overflows the int32
        # global_step comparison under jit
        return self.disc_start if self.disc_start > 0 else 2**31 - 1

    # probe methods for the engine's adaptive-d_weight vjps (call via
    # .apply(..., method="nll_scalar"/"g_scalar"))
    def nll_scalar(self, inputs: jax.Array, recons: jax.Array) -> jax.Array:
        nll, _ = self.nll_loss(inputs, recons)
        return nll

    def g_scalar(self, recons: jax.Array) -> jax.Array:
        # eval-mode BN: the probe must not mutate batch_stats
        return -jnp.mean(self.discriminator(recons, train=False))

    def nll_loss(self, inputs: jax.Array, recons: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Perceptual-weighted recon under learnable logvar (discriminator_loss.py:212+)."""
        if self.rec_loss_type in ("l2", "mse"):
            rec = (inputs - recons) ** 2
        else:
            rec = jnp.abs(inputs - recons)
        rec = rec * self.rec_weight
        if self.perceptual_weight > 0:
            p = self.perceptual_loss(inputs, recons)
            rec = rec + self.perceptual_weight * p
        logvar = self.logvar if self.learn_logvar else jax.lax.stop_gradient(self.logvar)
        nll = rec / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / nll.shape[0], rec

    def __call__(
        self,
        inputs: jax.Array,
        recons: jax.Array,
        global_step: jax.Array,
        optimizer_idx: int = 0,
        regularization_log: Optional[Mapping[str, jax.Array]] = None,
        d_weight: Optional[jax.Array] = None,
        split: str = "train",
        train: bool = True,
    ):
        gate = jnp.asarray((global_step >= self._disc_start()) | (not train), jnp.float32)

        if optimizer_idx == 0:
            nll, rec = self.nll_loss(inputs, recons)
            logits_fake = self.discriminator(recons, train=train)
            g_loss = -jnp.mean(logits_fake)
            if d_weight is None:
                d_weight = jnp.asarray(self.disc_weight)
            loss = nll + d_weight * self.disc_factor * gate * g_loss
            log = {
                f"{split}/loss/total": loss,
                f"{split}/loss/nll": nll,
                f"{split}/loss/rec": jnp.mean(rec),
                f"{split}/loss/g": g_loss,
                f"{split}/scalars/d_weight": jnp.asarray(d_weight, jnp.float32),
                f"{split}/scalars/logvar": self.logvar,
            }
            for key, weight in (self.regularization_weights or {}).items():
                if regularization_log and key in regularization_log:
                    term = regularization_log[key]
                    loss = loss + weight * jnp.mean(term)
                    log[f"{split}/loss/{key}"] = jnp.mean(term)
            log[f"{split}/loss/total"] = loss
            return loss, log

        if optimizer_idx == 1:
            logits_real = self.discriminator(jax.lax.stop_gradient(inputs), train=train)
            logits_fake = self.discriminator(jax.lax.stop_gradient(recons), train=train)
            d_fn = get_discr_loss_fn(self.disc_loss)
            d_loss = self.disc_factor * d_fn(logits_real, logits_fake) * gate
            log = {
                f"{split}/loss/disc": d_loss,
                f"{split}/logits/real": jnp.mean(logits_real),
                f"{split}/logits/fake": jnp.mean(logits_fake),
            }
            return d_loss, log

        raise ValueError(f"unknown optimizer_idx {optimizer_idx}")


def adaptive_disc_weight(
    nll_grad_last: jax.Array, g_grad_last: jax.Array, disc_weight: float = 1.0
) -> jax.Array:
    """d_weight from last-layer grad norms (discriminator_loss.py:198-210)."""
    d = jnp.linalg.norm(nll_grad_last) / (jnp.linalg.norm(g_grad_last) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(d, 0.0, 1e4)) * disc_weight


class VQLPIPSWithDiscriminator(GeneralLPIPSWithDiscriminator):
    """VQ-GAN loss (parity: autoencoding/losses/vqperceptual.py:16): the sgm
    GAN loss + codebook-loss passthrough (+ perplexity logging). Call with
    regularization_log={'loss/vq': ..., 'perplexity': ...} from the VQ
    regularizer; codebook_weight scales the VQ term."""

    codebook_weight: float = 1.0

    def __call__(self, inputs, recons, global_step, optimizer_idx=0,
                 regularization_log=None, d_weight=None, split="train", train=True):
        out = super().__call__(
            inputs, recons, global_step,
            optimizer_idx=optimizer_idx,
            regularization_log=None,  # VQ term handled below with its own weight
            d_weight=d_weight, split=split, train=train,
        )
        loss, log = out
        if optimizer_idx == 0 and regularization_log:
            if "loss/vq" in regularization_log:
                q = jnp.mean(regularization_log["loss/vq"])
                loss = loss + self.codebook_weight * q
                log[f"{split}/loss/vq"] = q
                log[f"{split}/loss/total"] = loss
            if "perplexity" in regularization_log:
                log[f"{split}/scalars/perplexity"] = regularization_log["perplexity"]
        return loss, log
