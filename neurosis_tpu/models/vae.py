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

from neurosis_tpu.modules.layers import Conv2d, GroupNorm32, gn_conv_fuse_ok, nearest_upsample_2x
from neurosis_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class ResnetBlock(nn.Module):
    """norm→silu→conv ×2 with 1x1/3x3 shortcut (model.py:85-141).

    `temb_channels > 0` enables the timestep-embedding injection used by the
    pixel-space `Model` (model.py:122-124: h += temb_proj(silu(temb))); the VAE
    Encoder/Decoder instantiate it with temb_channels=0 as in the reference.
    """

    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    temb_channels: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        temb: Optional[jax.Array] = None,
    ) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        _fuse_ok = lambda t: gn_conv_fuse_ok(t.shape, out_ch, self.dtype, t.dtype)
        gn1 = GroupNorm32(32, epsilon=1e-6, name="norm1")
        conv1 = Conv2d(out_ch, 3, dtype=self.dtype, name="conv1")
        if _fuse_ok(x):
            h = conv1(x, gn_affine=gn1(x, fold=True))
        else:
            h = conv1(nn.silu(gn1(x)))
        if self.temb_channels > 0:
            assert temb is not None, "ResnetBlock with temb_channels>0 needs temb"
            e = nn.Dense(out_ch, dtype=self.dtype, param_dtype=jnp.float32, name="temb_proj")(nn.silu(temb))
            h = h + e[:, None, None, :].astype(h.dtype)
        gn2 = GroupNorm32(32, epsilon=1e-6, name="norm2")
        conv2 = Conv2d(out_ch, 3, dtype=self.dtype, name="conv2")
        if (self.dropout == 0.0 or deterministic) and _fuse_ok(h):
            h = conv2(h, gn_affine=gn2(h, fold=True))
        else:
            h = nn.silu(gn2(h))
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv2(h)
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


class LinAttnBlock(nn.Module):
    """Linear (kernelized) spatial attention (attention.py:77-94 LinearAttention;
    model.py:137-141 pins heads=1, dim_head=in_channels and adds NO residual):
    softmax over *tokens* of k, then the low-rank context kᵀv is applied to
    q — O(S·d²) instead of O(S²·d)."""

    in_channels: int
    heads: int = 1
    dim_head: Optional[int] = None  # None → in_channels (LinAttnBlock pin)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        dim_head = self.dim_head or self.in_channels
        hidden = self.heads * dim_head
        qkv = Conv2d(hidden * 3, 1, padding=0, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, hh * ww, 3, self.heads, dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, H, D]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(q.dtype)
        context = jnp.einsum("bshd,bshe->bhde", k, v)
        out = jnp.einsum("bhde,bshd->bshe", context, q)
        out = out.reshape(b, hh, ww, hidden)
        return Conv2d(self.in_channels, 1, padding=0, dtype=self.dtype, name="to_out")(out)


def make_attn(in_channels: int, attn_type: str = "vanilla", dtype=None, name: str = "attn"):
    """Attention block factory (model.py:255-284). The reference's CUDA backend
    zoo (vanilla/xformers/torch-sdp) collapses to VAEAttnBlock, whose
    dot_product_attention dispatches to the right TPU kernel; 'linear' and
    'none' keep their distinct semantics."""
    if attn_type in ("vanilla", "vanilla-xformers", "memory-efficient-cross-attn", "torch-sdp"):
        return VAEAttnBlock(in_channels, dtype=dtype, name=name)
    if attn_type == "linear":
        return LinAttnBlock(in_channels, dtype=dtype, name=name)
    if attn_type == "none":
        return lambda x: x
    raise ValueError(f"attn_type {attn_type} unknown")


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
    attn_type: str = "vanilla"
    dtype: Optional[Dtype] = None
    # rematerialize each ResnetBlock in the backward pass (the torch side's
    # gradient checkpointing analog) — trades ~10% recompute for activation
    # memory; lets the 512px VAE-GAN G step fit larger batches in HBM
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        curr_res = self.resolution
        block_cls = nn.remat(ResnetBlock, static_argnums=(2,)) if self.remat else ResnetBlock

        h = Conv2d(self.ch, 3, dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = block_cls(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down.{i_level}.block.{i_block}",
                )(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(block_in, self.attn_type, dtype=self.dtype, name=f"down.{i_level}.attn.{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(block_in, self.resamp_with_conv, dtype=self.dtype, name=f"down.{i_level}.downsample")(h)
                curr_res //= 2

        h = block_cls(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_1")(h, deterministic)
        h = make_attn(block_in, self.attn_type, dtype=self.dtype, name="mid.attn_1")(h)
        h = block_cls(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_2")(h, deterministic)

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
    attn_type: str = "vanilla"
    dtype: Optional[Dtype] = None
    remat: bool = False  # see Encoder.remat

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        block_cls = nn.remat(ResnetBlock, static_argnums=(2,)) if self.remat else ResnetBlock

        h = Conv2d(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = block_cls(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_1")(h, deterministic)
        h = make_attn(block_in, self.attn_type, dtype=self.dtype, name="mid.attn_1")(h)
        h = block_cls(block_in, block_in, dropout=self.dropout, dtype=self.dtype, name="mid.block_2")(h, deterministic)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = block_cls(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up.{i_level}.block.{i_block}",
                )(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(block_in, self.attn_type, dtype=self.dtype, name=f"up.{i_level}.attn.{i_block}")(h)
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


def ddpm_timestep_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """DDPM/fairseq sinusoid used by the pixel-space Model (model.py:30-52):
    frequencies exp(-log(1e4)·i/(half-1)), SIN-first, zero-pad if odd — note
    this differs from the ADM UNet's embedding (cos-first, /half)."""
    import math as _math

    half = dim // 2
    # scalar-first multiply matches the reference's fp32 rounding exactly
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(_math.log(10000) / (half - 1)))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Model(nn.Module):
    """Pixel-space DDPM UNet (model.py:286-452): the VAE Encoder/Decoder
    topology with skip connections and optional timestep conditioning —
    used for pixel diffusion rather than latent diffusion. `context`, when
    given, is concatenated along channels (model.py:406-408).

    Torch dotted names match the reference for 1:1 weight import
    (temb.dense.0, down.N.block.M, mid.block_1, up.N.upsample, ...).
    """

    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int = 3
    resolution: int = 256
    use_timestep: bool = True
    dropout: float = 0.0
    resamp_with_conv: bool = True
    attn_type: str = "vanilla"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)

        temb_ch = self.ch * 4
        if self.use_timestep:
            assert t is not None, "Model(use_timestep=True) requires t"
            temb = ddpm_timestep_embedding(t, self.ch)
            temb = nn.Dense(temb_ch, dtype=self.dtype, param_dtype=jnp.float32, name="temb.dense.0")(temb)
            temb = nn.Dense(temb_ch, dtype=self.dtype, param_dtype=jnp.float32, name="temb.dense.1")(
                nn.silu(temb)
            )
        else:
            temb = None

        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        curr_res = self.resolution
        tc = temb_ch if self.use_timestep else 0

        hs = [Conv2d(self.ch, 3, dtype=self.dtype, name="conv_in")(x)]
        block_in = self.ch
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    temb_channels=tc,
                    dtype=self.dtype,
                    name=f"down.{i_level}.block.{i_block}",
                )(hs[-1], deterministic, temb)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(block_in, self.attn_type, dtype=self.dtype, name=f"down.{i_level}.attn.{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(
                    Downsample(
                        block_in, self.resamp_with_conv, dtype=self.dtype, name=f"down.{i_level}.downsample"
                    )(hs[-1])
                )
                curr_res //= 2

        h = ResnetBlock(block_in, block_in, dropout=self.dropout, temb_channels=tc, dtype=self.dtype, name="mid.block_1")(hs[-1], deterministic, temb)
        h = make_attn(block_in, self.attn_type, dtype=self.dtype, name="mid.attn_1")(h)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, temb_channels=tc, dtype=self.dtype, name="mid.block_2")(h, deterministic, temb)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            skip_in = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                if i_block == self.num_res_blocks:
                    skip_in = self.ch * in_ch_mult[i_level]
                h = ResnetBlock(
                    in_channels=block_in + skip_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    temb_channels=tc,
                    dtype=self.dtype,
                    name=f"up.{i_level}.block.{i_block}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), deterministic, temb)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(block_in, self.attn_type, dtype=self.dtype, name=f"up.{i_level}.attn.{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, self.resamp_with_conv, dtype=self.dtype, name=f"up.{i_level}.upsample")(h)
                curr_res *= 2

        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return Conv2d(self.out_ch, 3, dtype=self.dtype, name="conv_out")(h)
