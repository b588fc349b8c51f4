"""VAE training losses (parity: modules/autoencoding/losses/vae_lpips_discr.py).

Flax modules holding the LPIPS metric (+ discriminator for the GAN variant);
pure functions of (params, inputs, recons, step) with scalar outputs + log
dicts. Loss-EMA smoothing is a host-side concern (trainer/util.py EMATracker
equivalent lives in the logging layer).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .functions import get_discr_loss_fn
from .lpips import LPIPS
from .patchgan import NLayerDiscriminator


class AutoencoderPerceptual(nn.Module):
    """recon (L1/L2) + LPIPS with weights (vae_lpips_discr.py:25-137)."""

    recon_type: str = "l1"
    recon_weight: float = 1.0
    perceptual_weight: float = 1.0
    lpips_type: str = "alex"

    @nn.compact
    def __call__(self, inputs: jax.Array, recons: jax.Array, split: str = "train"):
        inputs = jnp.clip(inputs, -1.0, 1.0)
        recons = jnp.clip(recons, -1.0, 1.0)

        if self.recon_type in ("l2", "mse"):
            rec = jnp.mean((inputs - recons) ** 2, axis=tuple(range(1, inputs.ndim)))
        else:
            rec = jnp.mean(jnp.abs(inputs - recons), axis=tuple(range(1, inputs.ndim)))
        rec = rec * self.recon_weight

        p = LPIPS(pnet_type=self.lpips_type, name="perceptual_loss")(inputs, recons)
        p = nn.relu(p).reshape(p.shape[0]) * self.perceptual_weight

        loss = rec + p
        log = {
            f"{split}/loss/total": jnp.mean(loss),
            f"{split}/loss/rec": jnp.mean(rec),
            f"{split}/loss/p": jnp.mean(p),
        }
        return loss, log


class AutoencoderLPIPSWithDiscr(nn.Module):
    """recon + LPIPS + PatchGAN (vae_lpips_discr.py:140-387).

    __call__(inputs, recons, global_step, optimizer_idx, train):
      idx 0 (generator): p_rec + disc_factor·(−E[D(recons)] + R1(inputs)),
        GAN terms gated on global_step >= disc_start (lax.cond-free: weights
        multiply by a 0/1 gate so the program stays static);
      idx 1 (discriminator): hinge/vanilla on D(inputs), D(stop_grad(recons)).
    """

    recon_type: str = "l1"
    recon_weight: float = 1.0
    perceptual_weight: float = 1.0
    lpips_type: str = "alex"
    disc_start: int = -1
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_lambda_r1: float = 0.0
    disc_loss: str = "hinge"
    disc_input_nc: int = 3
    disc_n_layers: int = 3
    disc_ndf: int = 64

    def setup(self):
        self.discr = NLayerDiscriminator(
            input_nc=self.disc_input_nc, ndf=self.disc_ndf, n_layers=self.disc_n_layers, name="discr"
        )
        if self.perceptual_weight > 0:
            self.perceptual_loss = LPIPS(pnet_type=self.lpips_type, name="perceptual_loss")

    def _disc_start(self) -> int:
        # int32-safe 'never' sentinel: sys.maxsize overflows the int32
        # global_step comparison under jit
        return self.disc_start if self.disc_start > 0 else 2**31 - 1

    def __call__(
        self,
        inputs: jax.Array,
        recons: jax.Array,
        global_step: jax.Array,
        optimizer_idx: int = 0,
        split: str = "train",
        train: bool = True,
    ):
        inputs = jnp.clip(inputs, -1.0, 1.0)
        recons = jnp.clip(recons, -1.0, 1.0)
        # disc active gate: step >= disc_start, or always in eval (reference
        # `or not self.training`, vae_lpips_discr.py:318/373)
        gate = jnp.asarray((global_step >= self._disc_start()) | (not train), jnp.float32)

        if optimizer_idx == 0:
            axes = tuple(range(1, inputs.ndim))
            if self.recon_type in ("l2", "mse"):
                rec = jnp.mean((inputs - recons) ** 2, axis=axes)
            else:
                rec = jnp.mean(jnp.abs(inputs - recons), axis=axes)

            if self.perceptual_weight > 0:
                p = self.perceptual_loss(inputs, recons)
                p = nn.relu(p).reshape(p.shape[0])
                p_rec = rec * self.recon_weight + p * self.perceptual_weight
            else:
                p = jnp.zeros_like(rec)
                p_rec = rec * self.recon_weight

            # R1 penalty on the real inputs (vae_lpips_discr.py:303-308) —
            # appears in the G loss upstream; contributes no generator grads.
            # nn.vjp is the flax-lifted grad (plain jax.grad inside apply
            # leaks tracers through module state).
            if self.disc_lambda_r1 > 0:
                logits, vjp_fn = nn.vjp(
                    lambda mdl, z: mdl(z, train=train), self.discr, inputs, vjp_variables=False
                )
                # vjp_fn returns ({vars_cotangent}, *primal_cotangents)
                *_, in_grads = vjp_fn(jnp.full_like(logits, 1.0 / logits.size))
                r1 = jnp.mean(jnp.sum(in_grads**2, axis=axes)) * self.disc_lambda_r1
            else:
                r1 = jnp.asarray(0.0)
            logits_fake = self.discr(recons, train=train)
            g_loss = (-jnp.mean(logits_fake) + r1) * gate
            loss = p_rec + g_loss * self.disc_factor
            log = {
                f"{split}/loss/total": jnp.mean(loss),
                f"{split}/loss/rec": jnp.mean(rec),
                f"{split}/loss/p": jnp.mean(p),
                f"{split}/loss/g": jnp.mean(g_loss),
                f"{split}/loss/r1_penalty": r1,
            }
            return loss, log

        if optimizer_idx == 1:
            logits_real = self.discr(jax.lax.stop_gradient(inputs), train=train)
            logits_fake = self.discr(jax.lax.stop_gradient(recons), train=train)
            d_fn = get_discr_loss_fn(self.disc_loss)
            d_loss = self.disc_factor * self.disc_weight * d_fn(logits_real, logits_fake) * gate
            log = {
                f"{split}/loss/disc": d_loss,
                f"{split}/logits/real": jnp.mean(logits_real),
                f"{split}/logits/fake": jnp.mean(logits_fake),
            }
            return d_loss, log

        raise ValueError(f"Unknown optimizer_idx {optimizer_idx}")


class LatentLPIPS(nn.Module):
    """LPIPS between decoded latents (parity: autoencoding/losses/latent_lpips.py:10).

    `decoder_apply` is a pure callable latents→images (the engine's frozen
    decode); distance is LPIPS on the decoded pairs (+ optional latent L2)."""

    perceptual_weight: float = 1.0
    latent_weight: float = 1.0
    lpips_type: str = "vgg"

    @nn.compact
    def __call__(self, decoder_apply, latent_inputs: jax.Array, latent_preds: jax.Array,
                 split: str = "train"):
        log = {}
        loss = jnp.zeros(latent_inputs.shape[0])
        if self.latent_weight > 0:
            l2 = jnp.mean((latent_inputs - latent_preds) ** 2, axis=tuple(range(1, latent_inputs.ndim)))
            loss = loss + self.latent_weight * l2
            log[f"{split}/loss/latent_l2"] = jnp.mean(l2)
        if self.perceptual_weight > 0:
            img_in = decoder_apply(latent_inputs)
            img_pred = decoder_apply(latent_preds)
            p = LPIPS(pnet_type=self.lpips_type, name="perceptual_loss")(img_in, img_pred)
            p = nn.relu(p).reshape(p.shape[0])
            loss = loss + self.perceptual_weight * p
            log[f"{split}/loss/p"] = jnp.mean(p)
        log[f"{split}/loss/total"] = jnp.mean(loss)
        return loss, log
