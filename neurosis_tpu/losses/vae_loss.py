"""VAE training losses (parity: modules/autoencoding/losses/vae_lpips_discr.py).

Flax modules holding the LPIPS metric (+ discriminator for the GAN variant);
pure functions of (params, inputs, recons, step) with scalar outputs + log
dicts. Loss-EMA smoothing is a host-side concern (trainer/util.py EMATracker
equivalent lives in the logging layer).
"""

from __future__ import annotations


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

    def log_images(self, inputs: jax.Array, recons: jax.Array) -> dict:
        """Discriminator-logit visualization grids (vae_lpips_discr.py:202-309).

        Returns {"vis_logits", "vis_logits_blended"}: (1, H, W, 3) arrays in
        [-1, 1] — colormapped real/fake patch logits (real row on top, fake
        below) and the same logits alpha-blended over the images, each with a
        labeled colorbar strip. Empty when the discriminator is disabled or
        non-patch. Host-side numpy: called eagerly via `.apply(...,
        method="log_images")`, never inside jit."""
        import numpy as np

        from neurosis_tpu.utils.image import diverging_colormap, make_grid_nhwc

        if self.disc_start < 0 or self.disc_factor == 0:
            return {}
        inputs = jnp.clip(inputs, -1.0, 1.0)
        recons = jnp.clip(recons, -1.0, 1.0)
        logits_real = self.discr(jax.lax.stop_gradient(inputs), train=False)
        if logits_real.ndim < 4:
            return {}  # non-patch discriminator (vae_lpips_discr.py:214-216)
        logits_fake = self.discr(jax.lax.stop_gradient(recons), train=False)

        lr = np.asarray(logits_real, np.float32)  # (b, h', w', 1) NHWC
        lf = np.asarray(logits_fake, np.float32)
        high = max(float(np.abs(lr).max()), float(np.abs(lf).max()), 1e-8)

        h, w = inputs.shape[1], inputs.shape[2]

        def upsample(lg):  # nearest to image size (vae_lpips_discr.py:231-243)
            reps_h, reps_w = (h + lg.shape[1] - 1) // lg.shape[1], (w + lg.shape[2] - 1) // lg.shape[2]
            return np.repeat(np.repeat(lg, reps_h, axis=1), reps_w, axis=2)[:, :h, :w]

        lr, lf = upsample(lr), upsample(lf)
        alpha = 0.8 * np.concatenate(
            [make_grid_nhwc(np.abs(lr) / high, 4), make_grid_nhwc(np.abs(lf) / high, 4)], axis=0
        )  # (H, W, 1) in [0, 0.8]
        cm_r = diverging_colormap(((lr + high) / (2 * high))[..., 0])
        cm_f = diverging_colormap(((lf + high) / (2 * high))[..., 0])
        grid_logits = np.concatenate([make_grid_nhwc(cm_r, 4), make_grid_nhwc(cm_f, 4)], axis=0)
        grid_images = np.concatenate(
            [
                make_grid_nhwc(0.5 * np.asarray(inputs) + 0.5, 4),
                make_grid_nhwc(0.5 * np.asarray(recons) + 0.5, 4),
            ],
            axis=0,
        )
        grid_blend = alpha * grid_logits + (1 - alpha) * grid_images

        cbar = _colorbar_strip(grid_logits.shape[1], high)
        annotated = np.concatenate([grid_logits, cbar], axis=0)
        blended = np.concatenate([grid_blend, cbar], axis=0)
        return {
            "vis_logits": (2.0 * annotated - 1.0)[None],
            "vis_logits_blended": (2.0 * blended - 1.0)[None],
        }


def _colorbar_strip(width: int, high: float, height: int = 24):
    """Horizontal colorbar with ±high labels (matplotlib-free equivalent of
    vae_lpips_discr.py:281-303)."""
    import numpy as np

    from neurosis_tpu.utils.image import diverging_colormap

    ramp = diverging_colormap(np.linspace(0.0, 1.0, width))  # (width, 3)
    strip = np.broadcast_to(ramp[None], (height, width, 3)).copy()
    try:
        from PIL import Image, ImageDraw

        from neurosis_tpu.utils.image import _default_font

        img = Image.fromarray((strip * 255).astype(np.uint8))
        draw = ImageDraw.Draw(img)
        font = _default_font(max(10, height - 12))
        draw.text((2, 2), f"{-high:.2f}", fill=(0, 0, 0), font=font)
        label = f"{high:.2f}"
        tw = draw.textlength(label, font=font)
        draw.text((width - tw - 2, 2), label, fill=(0, 0, 0), font=font)
        strip = np.asarray(img, np.float32) / 255.0
    except Exception:  # pragma: no cover - labels are cosmetic
        pass
    return strip


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
