"""ldm-style convolutional VAE Encoder/Decoder in Flax (NHWC).

Behavioral parity target: modules/diffusion/model.py — ResnetBlock (85),
AttnBlock (144), Encoder (456), Decoder (609), Up/Downsample (44-82). Submodule
names are the exact torch dotted paths ('down.0.block.1', 'mid.block_1') for
1:1 weight import.

TPU-first notes: NHWC; the mid-block attention is one fused softmax attention
over h·w tokens (dispatched through ops.dot_product_attention → Pallas for
large latents); asymmetric stride-2 pad ((0,1),(0,1)) matches the reference's
ConstantPad2d (model.py:71-79).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurosis_tpu.modules.layers import Conv2d, GroupNorm32, nearest_upsample_2x
from neurosis_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class ResnetBlock(nn.Module):
    """norm→silu→conv ×2 with 1x1/3x3 shortcut (model.py:85-141); temb unused (VAE temb_ch=0)."""

    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        h = GroupNorm32(32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = Conv2d(out_ch, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv2d(out_ch, 3, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = Conv2d(out_ch, 3, dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = Conv2d(out_ch, 1, padding=0, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1 conv projections (model.py:144-253).

    Implements the canonical math of the reference's 'vanilla' AttnBlock /
    xformers MemoryEfficientAttnBlock (correct "b c h w -> b (h w) c" token
    layout). Note the reference's TorchSDPAttnBlock (model.py:228-253) has an
    upstream layout bug — it `.view(B,-1,1,C)`s the NCHW conv output without
    rearranging, scrambling channels into tokens — which we deliberately do not
    reproduce.
    """

    in_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = GroupNorm32(32, epsilon=1e-6, name="norm")(x)
        q = Conv2d(c, 1, padding=0, dtype=self.dtype, name="q")(h)
        k = Conv2d(c, 1, padding=0, dtype=self.dtype, name="k")(h)
        v = Conv2d(c, 1, padding=0, dtype=self.dtype, name="v")(h)
        # tokens: [B, 1 head, S, C]
        q = q.reshape(b, 1, hh * ww, c)
        k = k.reshape(b, 1, hh * ww, c)
        v = v.reshape(b, 1, hh * ww, c)
        out = dot_product_attention(q, k, v).reshape(b, hh, ww, c)
        out = Conv2d(c, 1, padding=0, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv or avg-pool (model.py:65-82)."""

    in_channels: int
    with_conv: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                self.in_channels,
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), (2, 2))


class Upsample(nn.Module):
    """Nearest 2x + optional conv (model.py:44-62)."""

    in_channels: int
    with_conv: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_2x(x)
        if self.with_conv:
            x = Conv2d(self.in_channels, 3, dtype=self.dtype, name="conv")(x)
        return x


class Encoder(nn.Module):
    """Image → latent moments [B,h,w,2z] (model.py:456-607, minus regularizer)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        curr_res = self.resolution

        h = Conv2d(self.ch, 3, dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down.{i_level}.block.{i_block}",
                )(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = VAEAttnBlock(block_in, dtype=self.dtype, name=f"down.{i_level}.attn.{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(block_in, self.resamp_with_conv, dtype=self.dtype, name=f"down.{i_level}.downsample")(h)
                curr_res //= 2

        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_1")(h, deterministic)
        h = VAEAttnBlock(block_in, dtype=self.dtype, name="mid.attn_1")(h)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_2")(h, deterministic)

        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv2d(out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """Latent → image (model.py:609-766)."""

    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int = 256
    z_channels: int = 4
    give_pre_end: bool = False
    tanh_out: bool = False
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = Conv2d(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_1")(h, deterministic)
        h = VAEAttnBlock(block_in, dtype=self.dtype, name="mid.attn_1")(h)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_2")(h, deterministic)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up.{i_level}.block.{i_block}",
                )(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = VAEAttnBlock(block_in, dtype=self.dtype, name=f"up.{i_level}.attn.{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, self.resamp_with_conv, dtype=self.dtype, name=f"up.{i_level}.upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, 3, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h
