"""DiffusionEngine — the SD/SDXL training task, as pure jitted step functions.

Behavioral parity target: models/diffusion.py:35-445 (DiffusionEngine). The
Lightning module becomes:

  - a config object holding Flax modules (UNet, frozen VAE enc/dec, conditioner)
    and pure math (denoiser, loss_fn, sampler);
  - `init(rng, batch)` → (TrainState, frozen_params);
  - `train_step(state, frozen, batch)` → (state', metrics) — pure, pjit-able:
    VAE-encode (frozen, stop-grad) → conditioner → StandardDiffusionLoss →
    grads → optimizer → EMA (models/diffusion.py:205-244 semantics);
  - `sample(...)` for the ImageLogger path (298-313).

TPU-first: batches are NHWC; the VAE encode runs inside the same jit (one HBM
round-trip); all randomness from the state's PRNG key; frozen subtrees live in
a separate pytree so gradients are never computed for them (cheaper than
requires_grad=False + stop_gradient).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from neurosis_tpu.diffusion.denoiser import Denoiser
from neurosis_tpu.diffusion.loss import StandardDiffusionLoss
from neurosis_tpu.models.unet import UNetModel
from neurosis_tpu.models.vae import Decoder, Encoder
from neurosis_tpu.modules.distributions import DiagonalGaussian
from neurosis_tpu.modules.ema import ema_copy_to, ema_init, ema_update
from neurosis_tpu.modules.encoders.embedding import GeneralConditioner
from neurosis_tpu.ops.dequant import dequant_image
from neurosis_tpu.trainer.state import TrainState, next_rngs


@dataclasses.dataclass
class DiffusionEngine:
    """Owns modules + math; produces pure step functions."""

    model: UNetModel
    denoiser: Denoiser
    loss_fn: StandardDiffusionLoss
    conditioner: GeneralConditioner
    first_stage: Optional[Any] = None  # AutoencoderKL (encode/decode methods)
    first_stage_encoder: Optional[Encoder] = None
    first_stage_decoder: Optional[Decoder] = None
    # IdentityFirstStage (models/autoencoder.py:645): pixel-space diffusion,
    # encode/decode are identity (scale_factor still applies)
    identity_first_stage: bool = False
    optimizer: Optional[optax.GradientTransformation] = None
    sampler: Any = None
    scale_factor: float = 0.18215
    input_key: str = "image"
    use_ema: bool = False
    ema_decay: float = 0.9999
    latents_key: Optional[str] = "latents"  # batch may carry pre-encoded latents
    trainable_embedders: Sequence[int] = ()  # indices of trainable conditioner embedders
    log_sigmas: bool = False  # per-sample loss/sigma breakdown (diffusion.py:216-232)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, rng: jax.Array, batch: dict) -> tuple[TrainState, dict]:
        """Initialize trainable + frozen param trees from an example batch."""
        r_unet, r_cond, r_vae, r_state = jax.random.split(rng, 4)
        latents = self._example_latents(batch)
        t = jnp.zeros((latents.shape[0],), jnp.float32)

        cond_vars = self.conditioner.init(r_cond, batch, rng=None)
        cond_params = cond_vars.get("params", {})
        cond_trainable, cond_frozen = self._split_conditioner(cond_params)

        cond = self.conditioner.apply({"params": cond_params}, batch, rng=None)
        unet_params = self.model.init(
            r_unet, latents, t, cond.get("crossattn"), y=cond.get("vector")
        )["params"]

        frozen = {"conditioner": cond_frozen}
        if self.first_stage is not None:
            img = dequant_image(batch[self.input_key])
            frozen["first_stage"] = self.first_stage.init(r_vae, img)["params"]
        else:
            if self.first_stage_encoder is not None:
                img = dequant_image(batch[self.input_key])
                frozen["first_stage_encoder"] = self.first_stage_encoder.init(r_vae, img)["params"]
            if self.first_stage_decoder is not None:
                z = latents / self.scale_factor
                frozen["first_stage_decoder"] = self.first_stage_decoder.init(r_vae, z)["params"]

        params = {"model": unet_params, "conditioner": cond_trainable}
        opt_state = self.optimizer.init(params) if self.optimizer else None
        ema = ema_init(params) if self.use_ema else None
        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=opt_state, ema=ema, rng=r_state
        )
        return state, frozen

    def _example_latents(self, batch: dict) -> jax.Array:
        if self.latents_key and self.latents_key in batch:
            return batch[self.latents_key]
        img = dequant_image(batch[self.input_key])
        if self.identity_first_stage:
            return jnp.zeros(img.shape, img.dtype)
        h, w = img.shape[1] // 8, img.shape[2] // 8
        return jnp.zeros((img.shape[0], h, w, self.model.in_channels), img.dtype)

    def _split_conditioner(self, cond_params: dict) -> tuple[dict, dict]:
        trainable, frozen = {}, {}
        for key, sub in cond_params.items():
            # children are named 'embedders.N'
            idx = int(key.rsplit(".", 1)[-1]) if key.startswith("embedders.") else -1
            (trainable if idx in set(self.trainable_embedders) else frozen)[key] = sub
        return trainable, frozen

    def _merged_cond_params(self, params: dict, frozen: dict) -> dict:
        merged = dict(frozen.get("conditioner", {}))
        merged.update(params.get("conditioner", {}))
        return merged

    # ------------------------------------------------------------------
    # first stage (frozen VAE)
    # ------------------------------------------------------------------

    def encode_first_stage(self, frozen: dict, x: jax.Array, rng: jax.Array) -> jax.Array:
        """images [-1,1] NHWC → scaled latents (models/diffusion.py:187-197).
        uint8 batches (the int8 input path, ops/dequant.py) dequantize here —
        XLA fuses the multiply-add into the VAE conv_in."""
        x = dequant_image(x)
        if self.identity_first_stage:
            return jax.lax.stop_gradient(self.scale_factor * x)
        if self.first_stage is not None:
            moments = self.first_stage.apply(
                {"params": frozen["first_stage"]}, x, method="encode"
            )
        else:
            moments = self.first_stage_encoder.apply({"params": frozen["first_stage_encoder"]}, x)
        z = DiagonalGaussian.from_moments(moments).sample(rng)
        return jax.lax.stop_gradient(self.scale_factor * z)

    def decode_first_stage(self, frozen: dict, z: jax.Array) -> jax.Array:
        if self.identity_first_stage:
            return z / self.scale_factor
        if self.first_stage is not None:
            return self.first_stage.apply(
                {"params": frozen["first_stage"]}, z / self.scale_factor, method="decode"
            )
        return self.first_stage_decoder.apply(
            {"params": frozen["first_stage_decoder"]}, z / self.scale_factor
        )

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def loss(self, params: dict, frozen: dict, batch: dict, latents: jax.Array, rng: jax.Array):
        """Per-batch mean loss (models/diffusion.py:199-233 forward path)."""
        cond_rng, loss_rng = jax.random.split(rng)
        cond = self.conditioner.apply(
            {"params": self._merged_cond_params(params, frozen)}, batch, rng=cond_rng
        )

        def network_apply(x, c_noise, c, **extra):
            return self.model.apply(
                {"params": params["model"]},
                x,
                c_noise,
                c.get("crossattn"),
                y=c.get("vector"),
                deterministic=False,
                **extra,
            )

        per_sample = self.loss_fn(network_apply, self.denoiser, cond, latents, loss_rng, batch=batch)
        if "loss_scale" in batch:
            # per-sample multipliers from loss hooks (TagFrequencyHook contract)
            per_sample = per_sample * batch["loss_scale"].astype(per_sample.dtype)
        metrics = {"loss": per_sample.mean()}
        if self.log_sigmas:
            # `train/loss_s0`-style breakdown (models/diffusion.py:216-232):
            # sample-0's loss, the spread across the batch's drawn sigmas
            metrics["loss_s0"] = per_sample[0]
            metrics["loss_smax"] = per_sample.max()
            metrics["loss_smin"] = per_sample.min()
        return per_sample.mean(), metrics

    def train_step(self, state: TrainState, frozen: dict, batch: dict):
        """One optimization step; pure — wrap in jit/shard_map outside."""
        rng, vae_rng, step_rng = next_rngs(state.rng, 2)

        if self.latents_key and self.latents_key in batch:
            latents = batch[self.latents_key]
        else:
            latents = self.encode_first_stage(frozen, batch[self.input_key], vae_rng)

        (loss_val, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state.params, frozen, batch, latents, step_rng
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema = ema_update(state.ema, params, self.ema_decay) if state.ema is not None else None
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema, rng=rng
        )
        metrics = dict(metrics)
        from neurosis_tpu.optimizers.stacked import stacked_global_norm

        metrics["grad_norm"] = stacked_global_norm(grads)
        return new_state, metrics

    def eval_step(self, state: TrainState, frozen: dict, batch: dict):
        """Loss-only step for `validate` (no grads, no optimizer update).

        With use_ema, also evaluates under the EMA shadows and reports
        `*_ema`-suffixed metrics — the reference's validation ema_scope
        (models/autoencoder.py:295-300 pattern applied to this engine)."""
        rng, vae_rng, step_rng = next_rngs(state.rng, 2)
        if self.latents_key and self.latents_key in batch:
            latents = batch[self.latents_key]
        else:
            latents = self.encode_first_stage(frozen, batch[self.input_key], vae_rng)
        _, metrics = self.loss(state.params, frozen, batch, latents, step_rng)
        if self.use_ema and state.ema is not None:
            _, ema_metrics = self.loss(
                ema_copy_to(state.ema, state.params), frozen, batch, latents, step_rng
            )
            metrics = dict(metrics, **{f"{k}_ema": v for k, v in ema_metrics.items()})
        return state._replace(rng=rng), metrics

    def eval_params(self, state: TrainState) -> dict:
        """ema_scope equivalent (models/diffusion.py:247-257): the EMA shadow
        tree substituted for the trainable params, cast to live dtypes. Used
        by every sampling/plotting/export consumer; raw params when EMA is
        off. Being functional, there is no store/restore dance — the live
        tree is never mutated."""
        if self.use_ema and getattr(state, "ema", None) is not None:
            return ema_copy_to(state.ema, state.params)
        return state.params

    # ------------------------------------------------------------------
    # sampling / eval (models/diffusion.py:298-313, 423-445)
    # ------------------------------------------------------------------

    def denoiser_fn(self, params: dict) -> Callable:
        def network_apply(x, c_noise, cond, **extra):
            return self.model.apply(
                {"params": params["model"]}, x, c_noise, cond.get("crossattn"), y=cond.get("vector"), **extra
            )

        def denoise(x, sigma, cond):
            return self.denoiser(network_apply, x, sigma, cond, "D")

        return denoise

    def sample(
        self,
        params: dict,
        frozen: dict,
        cond: dict,
        uc: Optional[dict],
        rng: jax.Array,
        shape: tuple,
        num_steps: Optional[int] = None,
    ) -> jax.Array:
        if self.sampler is None:
            raise ValueError("no sampler configured")
        # cache one jitted sampling program per (shape, num_steps): the σ-table
        # math is host-side numpy, so the whole CFG loop traces once — repeat
        # image logs then skip the (expensive) UNet re-trace entirely
        cache = getattr(self, "_sample_cache", None)
        if cache is None:
            cache = {}
            self._sample_cache = cache
        key = (tuple(shape), num_steps)
        if key not in cache:

            def _run(params, randn, cond, uc):
                return self.sampler(self.denoiser_fn(params), randn, cond, uc, num_steps=num_steps)

            cache[key] = jax.jit(_run)
        randn = jax.random.normal(rng, shape)
        return cache[key](params, randn, cond, uc)

    def log_images(
        self,
        params: dict,
        frozen: dict,
        batch: dict,
        num_img: int = 4,
        do_sample: bool = True,
        rng: Optional[jax.Array] = None,
        no_cond_log: bool = False,
        captions: Optional[Sequence[str]] = None,
        num_steps: Optional[int] = None,
    ) -> dict:
        """inputs / reconstructions / samples (+ rendered conditioning text)
        — models/diffusion.py:315-420. Returns numpy NHWC images in [-1,1]."""
        import numpy as np

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = dequant_image(jnp.asarray(batch[self.input_key][:num_img]))
        n = x.shape[0]
        log: dict = {"inputs": np.asarray(x)}

        enc_rng, sample_rng = jax.random.split(rng)
        z = self.encode_first_stage(frozen, x, enc_rng)
        log["reconstructions"] = np.asarray(self.decode_first_stage(frozen, z))

        if not no_cond_log and captions is not None:
            from neurosis_tpu.utils.sgm import log_txt_as_img

            wh = (x.shape[2], x.shape[1])
            log["conditioning"] = log_txt_as_img(wh, list(captions[:n]))

        if do_sample and self.sampler is not None:
            cond_params = {"params": self._merged_cond_params(params, frozen)}
            small = {
                k: (v[:n] if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and v.shape[0] >= n else v)
                for k, v in batch.items()
                if hasattr(v, "shape") or k in ("uncond_ids",)
            }
            c, uc = self.conditioner.get_unconditional_conditioning(cond_params, small)
            samples = self.sample(params, frozen, c, uc, sample_rng, z.shape, num_steps=num_steps)
            log["samples"] = np.asarray(self.decode_first_stage(frozen, samples))
        return log
