"""AutoencodingEngine — VAE/GAN training (parity: models/autoencoder.py:134-505).

The reference's Lightning manual-optimization dance (`optimizer_idx =
batch_idx % len(opts)` gated on disc_start, training_step 280-293) becomes two
jitted step functions over disjoint trainable trees:

  - g_step: grads wrt {encoder, decoder} through recon+LPIPS+(−E[D(recon)])
  - d_step: grads wrt {loss.discr} through hinge/vanilla on D(x), D(recon)

The host loop alternates them with the same schedule. KL regularization via
DiagonalGaussian; EMA of generator params; batch_stats for the discriminator's
BatchNorm threaded as mutable state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from neurosis_tpu.models.vae import Decoder, Encoder
from neurosis_tpu.ops.dequant import dequant_image
from neurosis_tpu.modules.distributions import DiagonalGaussian
from neurosis_tpu.modules.ema import EmaState, ema_copy_to, ema_init, ema_update
from neurosis_tpu.trainer.state import next_rngs


@flax.struct.dataclass
class VAETrainState:
    step: jax.Array
    params: Any  # {'encoder', 'decoder', 'loss'} — loss holds lpips(frozen)+discr
    batch_stats: Any  # discriminator BN running stats
    g_opt_state: optax.OptState
    d_opt_state: Optional[optax.OptState]
    ema: Optional[EmaState]
    rng: jax.Array
    # EMAVectorQuantizer's mutable codebook ('ema_stats' collection); None
    # for gradient-trained bottlenecks
    reg_stats: Any = None


def _tree_paths_with(tree: dict, keys: tuple) -> dict:
    return {k: tree[k] for k in keys if k in tree}


def _mask_subtree(tree: Any, needle: str) -> Any:
    """Bool mask tree: True for leaves whose path contains `needle`."""
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [
        any(needle in str(getattr(p, "key", p)) for p in path) for path, _ in flat[0]
    ]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(tree), leaves)


@dataclasses.dataclass
class AutoencodingEngine:
    encoder: Encoder
    decoder: Decoder
    loss: Any  # AutoencoderPerceptual | AutoencoderLPIPSWithDiscr
    g_optimizer: optax.GradientTransformation = None
    d_optimizer: Optional[optax.GradientTransformation] = None
    kl_weight: float = 0.0  # regularization_weights['kl_loss'] equivalent
    # pluggable bottleneck (reference regularizer_config, autoencoder.py:160-166):
    # None → diagonal-Gaussian KL (the AutoencoderKL default); a plain
    # regularizer (Identity/DiagonalGaussianRegularizer) or a flax VQ module
    # (VectorQuantizer[WithInputProjection]/GumbelQuantizer — params train with
    # the generator; EMAVectorQuantizer's mutable codebook lives in
    # VAETrainState.reg_stats and updates during g_step)
    regularizer: Optional[Any] = None
    sample_posterior: bool = True
    input_key: str = "image"
    use_ema: bool = False
    ema_decay: float = 0.9999
    disc_start: int = -1
    # selective freeze (DiffusersAutoencodingEngine parity, autoencoder_hf.py:111-136)
    freeze_encoder: bool = False
    freeze_decoder: bool = False
    # taming-style adaptive d_weight (GeneralLPIPSWithDiscriminator,
    # discriminator_loss.py:198-210): ratio of nll/g grad norms at the
    # decoder's last layer, computed with two extra decoder backwards
    adaptive_disc_weight: bool = False
    # small-error brightness boost in log_images diff maps (autoencoder.py:160)
    diff_boost_factor: float = 3.0

    @property
    def has_discriminator(self) -> bool:
        # AutoencoderLPIPSWithDiscr and GeneralLPIPS/VQLPIPSWithDiscriminator
        return hasattr(self.loss, "disc_loss")

    @property
    def _reg_is_module(self) -> bool:
        import flax.linen as fnn

        return isinstance(self.regularizer, fnn.Module)

    def _g_keys(self) -> tuple:
        keys = []
        if not self.freeze_encoder:
            keys.append("encoder")
        if not self.freeze_decoder:
            keys.append("decoder")
        if not keys:
            raise ValueError("both encoder and decoder frozen — nothing to train")
        if self._reg_is_module:
            keys.append("regularizer")  # VQ codebook trains with the generator
        return tuple(keys)

    def _regularize(
        self,
        params: dict,
        moments: jax.Array,
        rng: Optional[jax.Array],
        reg_stats: Any = None,
        train: bool = False,
    ):
        """moments/z → (z, regularization_log, new_reg_stats) via the
        configured bottleneck. reg_stats is the EMAVectorQuantizer codebook
        collection; it only updates when train=True."""
        if self.regularizer is None:
            dist = DiagonalGaussian.from_moments(moments)
            z = dist.sample(rng) if (self.sample_posterior and rng is not None) else dist.mode()
            return z, {"kl_loss": dist.kl()}, reg_stats
        if self._reg_is_module:
            import inspect

            sig = inspect.signature(type(self.regularizer).__call__).parameters
            variables = {"params": params.get("regularizer", {})}
            kwargs = {}
            # GumbelQuantizer needs the rng for its gumbel noise + straight-
            # through path; plain VQ takes only z
            args = (moments, rng) if (rng is not None and "rng" in sig) else (moments,)
            if "train" in sig:
                kwargs["train"] = train
            if reg_stats is not None:
                variables["ema_stats"] = reg_stats
                if train:
                    (z, log), upd = self.regularizer.apply(
                        variables, *args, mutable=["ema_stats"], **kwargs
                    )
                    return z, log, upd["ema_stats"]
            z, log = self.regularizer.apply(variables, *args, **kwargs)
            return z, log, reg_stats
        z, log = self.regularizer(moments, rng)
        return z, log, reg_stats

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array, batch: dict) -> VAETrainState:
        x = dequant_image(batch[self.input_key])
        r_enc, r_dec, r_loss, r_reg, r_state = jax.random.split(rng, 5)
        enc_params = self.encoder.init(r_enc, x)["params"]
        moments = self.encoder.apply({"params": enc_params}, x)
        reg_params = {}
        reg_stats = None
        if self._reg_is_module:
            reg_vars = self.regularizer.init(r_reg, moments)
            reg_params = reg_vars.get("params", {})
            reg_stats = reg_vars.get("ema_stats") or None
        z, _, _ = self._regularize({"regularizer": reg_params}, moments, rng=None, reg_stats=reg_stats)
        dec_params = self.decoder.init(r_dec, z)["params"]

        if self.has_discriminator:
            loss_vars = self.loss.init(r_loss, x, x, jnp.asarray(0), optimizer_idx=0)
        else:
            loss_vars = self.loss.init(r_loss, x, x)
        loss_params = loss_vars.get("params", {})
        batch_stats = loss_vars.get("batch_stats", {})

        params = {"encoder": enc_params, "decoder": dec_params, "loss": loss_params}
        if self._reg_is_module:
            params["regularizer"] = reg_params
        g_params = _tree_paths_with(params, self._g_keys())
        g_opt_state = self.g_optimizer.init(g_params)
        d_opt_state = None
        if self.has_discriminator and self.d_optimizer is not None:
            # only the discriminator inside 'loss' trains; LPIPS is frozen
            d_tree = {"loss": params["loss"]}
            mask = _mask_subtree(d_tree, "discr")
            self._masked_d_opt = optax.masked(self.d_optimizer, mask)
            d_opt_state = self._masked_d_opt.init(d_tree)
        ema = ema_init(g_params) if self.use_ema else None
        return VAETrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            ema=ema,
            rng=r_state,
            reg_stats=reg_stats,
        )

    # ------------------------------------------------------------------

    def forward(
        self,
        params: dict,
        x: jax.Array,
        rng: Optional[jax.Array],
        reg_stats: Any = None,
        train: bool = False,
    ):
        """encode → regularize (KL sample / VQ quantize) → decode
        (autoencoder.py:469-504). Returns (z, recons, reg_log); use
        forward_with_stats for the EMA-codebook training path."""
        z, recons, reg_log, _ = self.forward_with_stats(params, x, rng, reg_stats, train=False)
        return z, recons, reg_log

    def forward_with_stats(
        self,
        params: dict,
        x: jax.Array,
        rng: Optional[jax.Array],
        reg_stats: Any = None,
        train: bool = False,
    ):
        moments = self.encoder.apply({"params": params["encoder"]}, x)
        z, reg_log, new_stats = self._regularize(params, moments, rng, reg_stats, train=train)
        recons = self.decoder.apply({"params": params["decoder"]}, z)
        return z, recons, reg_log, new_stats

    def _loss_apply(self, loss_params, batch_stats, inputs, recons, step, optimizer_idx,
                    train=True, **extra):
        variables = {"params": loss_params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if self.has_discriminator or hasattr(self.loss, "discriminator"):
            out, updated = self.loss.apply(
                variables,
                inputs,
                recons,
                step,
                optimizer_idx=optimizer_idx,
                train=train,
                mutable=["batch_stats"],
                **extra,
            )
            return out, updated.get("batch_stats", batch_stats)
        out = self.loss.apply(variables, inputs, recons)
        return out, batch_stats

    def _compute_adaptive_weight(self, state: VAETrainState, x: jax.Array, z_rng):
        """d_weight = ‖∂nll/∂conv_out‖ / (‖∂g/∂conv_out‖+1e-4)
        (discriminator_loss.py:198-210), via two decoder backwards."""
        from neurosis_tpu.losses.discriminator_loss import adaptive_disc_weight

        variables = {"params": state.params["loss"]}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def recon_of(dec_params):
            params = dict(state.params)
            params["decoder"] = dec_params
            _, recons, _ = self.forward(params, x, z_rng, reg_stats=state.reg_stats)
            return recons

        def last_kernel(tree):
            return tree["conv_out"]["Conv_0"]["kernel"]

        nll_grad = jax.grad(
            lambda dec: self.loss.apply(variables, x, recon_of(dec), method="nll_scalar")
        )(state.params["decoder"])
        g_grad = jax.grad(
            lambda dec: self.loss.apply(variables, recon_of(dec), method="g_scalar")
        )(state.params["decoder"])
        return adaptive_disc_weight(
            last_kernel(nll_grad), last_kernel(g_grad), getattr(self.loss, "disc_weight", 1.0)
        )

    # ------------------------------------------------------------------

    def g_step(self, state: VAETrainState, batch: dict):
        """Generator (AE) update — optimizer_idx 0."""
        rng, z_rng = next_rngs(state.rng, 1)
        x = dequant_image(batch[self.input_key])

        extra = {}
        if self.adaptive_disc_weight and hasattr(self.loss, "nll_scalar"):
            extra["d_weight"] = self._compute_adaptive_weight(state, x, z_rng)

        def loss_fn(g_params):
            params = dict(state.params)
            params.update(g_params)
            z, recons, reg_log, new_reg_stats = self.forward_with_stats(
                params, x, z_rng, state.reg_stats, train=True
            )
            import inspect

            loss_takes_reg = self.has_discriminator and (
                "regularization_log" in inspect.signature(self.loss.__call__).parameters
            )
            call_extra = dict(extra)
            if loss_takes_reg:
                # sgm-family losses consume the regularizer's log directly
                # (VQ codebook term, regularization_weights passthrough)
                call_extra["regularization_log"] = reg_log
            (loss, log), new_stats = self._loss_apply(
                params["loss"], state.batch_stats, x, recons, state.step, 0, **call_extra
            )
            total = jnp.mean(loss)
            if self.kl_weight > 0 and "kl_loss" in reg_log:
                kl = jnp.mean(reg_log["kl_loss"])
                total = total + self.kl_weight * kl
                log = dict(log, **{"train/loss/kl": kl})
            elif self.regularizer is not None and not loss_takes_reg:
                # losses that don't see reg_log (plain recon, taming-style
                # AutoencoderLPIPSWithDiscr): add the VQ/commitment term
                # engine-side (its own β already scales it) so the codebook
                # actually trains
                lk = getattr(self.regularizer, "loss_key", None)
                if lk and lk in reg_log:
                    q = jnp.mean(reg_log[lk])
                    total = total + q
                    log = dict(log, **{f"train/{lk}": q})
            return total, (log, new_stats, new_reg_stats)

        g_params = _tree_paths_with(state.params, self._g_keys())
        (total, (log, new_stats, new_reg_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = self.g_optimizer.update(grads, state.g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)

        params = dict(state.params)
        params.update(g_params)
        ema = ema_update(state.ema, g_params, self.ema_decay) if state.ema is not None else None
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            g_opt_state=g_opt_state,
            ema=ema,
            rng=rng,
            reg_stats=new_reg_stats,
        )
        return new_state, dict(log, total=total)

    def d_step(self, state: VAETrainState, batch: dict):
        """Discriminator update — optimizer_idx 1."""
        if not self.has_discriminator:
            raise ValueError("engine has no discriminator")
        rng, z_rng = next_rngs(state.rng, 1)
        x = dequant_image(batch[self.input_key])
        z, recons, _ = self.forward(state.params, x, z_rng, reg_stats=state.reg_stats)
        recons = jax.lax.stop_gradient(recons)

        def loss_fn(d_params):
            (d_loss, log), new_stats = self._loss_apply(
                d_params["loss"], state.batch_stats, x, recons, state.step, 1
            )
            return d_loss, (log, new_stats)

        d_params = {"loss": state.params["loss"]}
        (d_loss, (log, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = self._masked_d_opt.update(grads, state.d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)

        params = dict(state.params)
        params["loss"] = d_params["loss"]
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, dict(log, total=d_loss)

    # ------------------------------------------------------------------
    # eval / observability (autoencoder.py:295-427)
    # ------------------------------------------------------------------

    def eval_params(self, state: VAETrainState) -> dict:
        """ema_scope equivalent (autoencoder.py:264-277): EMA shadows (tracked
        over the generator subtree) substituted into the full param tree."""
        if self.use_ema and state.ema is not None:
            params = dict(state.params)
            params.update(ema_copy_to(state.ema, _tree_paths_with(state.params, self._g_keys())))
            return params
        return state.params

    def eval_step(self, state: VAETrainState, batch: dict):
        """validation_step (autoencoder.py:295-301): generator loss with raw
        params, then again under the EMA scope (`*_ema` metrics)."""
        rng, z_rng = next_rngs(state.rng, 1)
        x = dequant_image(batch[self.input_key])

        def _metrics(params):
            _, recons, reg_log = self.forward(params, x, z_rng, reg_stats=state.reg_stats)
            (loss, log), _ = self._loss_apply(
                params["loss"], state.batch_stats, x, recons, state.step, 0, train=False
            )
            total = jnp.mean(loss)
            if self.kl_weight > 0 and "kl_loss" in reg_log:
                total = total + self.kl_weight * jnp.mean(reg_log["kl_loss"])
            return dict(log, total=total)

        metrics = {k.replace("train", "val", 1) if k.startswith("train") else k: v
                   for k, v in _metrics(state.params).items()}
        if self.use_ema and state.ema is not None:
            ema_m = _metrics(self.eval_params(state))
            metrics.update({
                (k.replace("train", "val", 1) if k.startswith("train") else k) + "_ema": v
                for k, v in ema_m.items()
            })
        return dataclasses.replace(state, rng=rng), metrics

    def log_images(self, state: VAETrainState, batch: dict, num_img: int = 4,
                   rng: Optional[jax.Array] = None, log_loss_images: bool = True) -> dict:
        """inputs / reconstructions / diff maps (+ `_ema` variants, + the
        loss's discriminator-logit grids) — autoencoder.py:373-427 and
        autoencoder_hf.py:228-256. Returns numpy NHWC images in [-1,1]."""
        import numpy as np

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = dequant_image(batch[self.input_key])[:num_img]

        def _recon_and_diffs(params, suffix=""):
            _, recons, _ = self.forward(params, x, rng, reg_stats=state.reg_stats)
            diff = jnp.clip(0.5 * jnp.abs(jnp.clip(recons, -1.0, 1.0) - x), 0.0, 1.0)
            return {
                f"reconstructions{suffix}": np.asarray(recons),
                f"diff{suffix}": np.asarray(2.0 * diff - 1.0),
                f"diff_boost{suffix}": np.asarray(
                    2.0 * jnp.clip(self.diff_boost_factor * diff, 0.0, 1.0) - 1.0
                ),
            }

        log = {"inputs": np.asarray(x)}
        log.update(_recon_and_diffs(state.params))
        if self.use_ema and state.ema is not None:
            log.update(_recon_and_diffs(self.eval_params(state), suffix="_ema"))

        if log_loss_images and hasattr(self.loss, "log_images"):
            # discriminator-logit visualization (vae_lpips_discr.py:202-309)
            try:
                variables = {"params": state.params["loss"]}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                recons = jnp.asarray(log["reconstructions"])
                log.update(self.loss.apply(variables, x, recons, method="log_images"))
            except Exception:  # pragma: no cover - visualization is best-effort
                import logging

                logging.getLogger(__name__).exception("loss.log_images failed")
        return log

    # ------------------------------------------------------------------

    def train_step_schedule(self, batch_idx: int, global_step: int) -> int:
        """optimizer_idx schedule (autoencoder.py:280-293): alternate once the
        discriminator has started; 0 before."""
        if not self.has_discriminator or self.disc_start < 0:
            return 0
        if global_step < self.disc_start:
            return 0
        return batch_idx % 2
