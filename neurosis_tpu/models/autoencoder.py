"""AutoencoderKL — VAE with quant convs (parity: models/autoencoder.py:507-700).

One linen module with children named encoder/decoder/quant_conv/post_quant_conv
so sgm-layout VAE checkpoints (first_stage_model.* or bare vae .safetensors)
import 1:1. `encode` returns moments [B,h,w,2z]; `decode` takes latents.

The reference's DiffusionEngine relocates the frozen VAE halves out of the
checkpoint graph (`vae_encoder.*`, models/diffusion.py:146-164); our engine
holds this module in the `frozen` tree instead — no relocation needed, but
torch_import accepts both key prefixes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurosis_tpu.modules.layers import Conv2d

from .vae import Decoder, Encoder

Dtype = jnp.dtype


class AutoencoderKL(nn.Module):
    """ddconfig-driven KL autoencoder (config surface: models/autoencoder.py:507-524)."""

    ddconfig: dict
    embed_dim: int = 4
    dtype: Optional[Dtype] = None

    def setup(self):
        dd = dict(self.ddconfig)
        # CUDA backend spellings (vanilla-xformers etc.) normalize in make_attn;
        # linear/none keep their distinct semantics
        attn_type = dd.pop("attn_type", "vanilla")
        double_z = dd.pop("double_z", True)
        z_ch = dd.get("z_channels", 4)
        self.encoder = Encoder(
            ch=dd["ch"],
            ch_mult=dd.get("ch_mult", [1, 2, 4, 8]),
            num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=dd.get("attn_resolutions", []),
            in_channels=dd.get("in_channels", 3),
            resolution=dd.get("resolution", 256),
            z_channels=z_ch,
            double_z=double_z,
            dropout=dd.get("dropout", 0.0),
            attn_type=attn_type,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = Decoder(
            ch=dd["ch"],
            out_ch=dd.get("out_ch", 3),
            ch_mult=dd.get("ch_mult", [1, 2, 4, 8]),
            num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=dd.get("attn_resolutions", []),
            resolution=dd.get("resolution", 256),
            z_channels=z_ch,
            dropout=dd.get("dropout", 0.0),
            attn_type=attn_type,
            dtype=self.dtype,
            name="decoder",
        )
        mult = 2 if double_z else 1
        self.quant_conv = Conv2d(mult * self.embed_dim, 1, padding=0, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv2d(z_ch, 1, padding=0, dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """image → moments [B, h, w, 2*embed_dim]."""
        h = self.encoder(x, deterministic)
        return self.quant_conv(h)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """init path: encode then decode the mode."""
        moments = self.encode(x, deterministic)
        if self.ddconfig.get("double_z", True):
            # KL: moments = (mean, logvar) — decode the mean
            moments, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(moments, deterministic)


class AutoencoderKLInferenceWrapper(AutoencoderKL):
    """encode() returns a latent sample instead of moments
    (models/autoencoder.py:640-643). Pass `rng` to sample; default = mode
    (the deterministic analog of the reference's stochastic .sample())."""

    def encode(self, x: jax.Array, deterministic: bool = True, rng=None) -> jax.Array:
        from neurosis_tpu.modules.distributions import DiagonalGaussian

        moments = super().encode(x, deterministic)
        dist = DiagonalGaussian.from_moments(moments)
        return dist.sample(rng) if rng is not None else dist.mode()


class IdentityFirstStage:
    """Pass-through first stage for pixel-space diffusion
    (models/autoencoder.py:645-660): encode/decode are identity."""

    def __init__(self, input_key: str = "jpg", **_):
        self.input_key = input_key

    def get_input(self, batch) -> jax.Array:
        return batch[self.input_key]

    def encode(self, x, *args, **kwargs):
        return x

    def decode(self, x, *args, **kwargs):
        return x


class AEIntegerWrapper:
    """Inference wrapper exposing a VQ autoencoder as int-token codec
    (models/autoencoder.py:662-700): encode → flat codebook indices,
    decode(indices) → image via the regularizer's codebook.

    Functional idiom: wraps a flax AE module + its bound variables and the VQ
    regularizer module + variables (the reference grabs `model.regularization`
    by attribute; here both halves are explicit).
    """

    def __init__(self, model, variables, quantizer, quantizer_variables, shape=(16, 16)):
        if not (hasattr(model, "encode") and hasattr(model, "decode")):
            raise ValueError("Need AE interface (encode and decode methods)")
        self.model = model
        self.variables = variables
        self.quantizer = quantizer
        self.quantizer_variables = quantizer_variables
        self.shape = tuple(shape) if shape is not None else None

    def encode(self, x: jax.Array) -> jax.Array:
        z = self.model.apply(self.variables, x, method="encode")
        _, log = self.quantizer.apply(self.quantizer_variables, z)
        idx = log["min_encoding_indices"]
        return idx.reshape(idx.shape[0], -1)

    def decode(self, indices: jax.Array, shape=None) -> jax.Array:
        shape = shape or self.shape
        if shape is not None:
            if len(shape) != 2:
                raise ValueError(f"Invalid input shape: {shape}")
            indices = indices.reshape(indices.shape[0], shape[0], shape[1])
        h = self.quantizer.apply(
            self.quantizer_variables, indices, method="get_codebook_entry"
        )
        return self.model.apply(self.variables, h, method="decode")
