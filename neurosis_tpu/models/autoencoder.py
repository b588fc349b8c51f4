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

from typing import Any, Optional

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
        dd.pop("attn_type", None)  # attention backend is a dispatch concern here
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
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean, deterministic)
