"""ADM/SDXL UNet backbone in Flax (NHWC), with Pallas-backed attention.

Behavioral parity target: modules/diffusion/openaimodel.py:460-841 (UNetModel),
200-342 (ResBlock), 96-199 (Up/Downsample), 451-457 (Timestep). Architecture
(channel schedule, skip concatenation, attention placement at
`attention_resolutions`, label-embedding modes) matches the reference so that
reference checkpoints import 1:1; the implementation is JAX-idiomatic: pure
function of (params, x, t, context, y), NHWC layout, `nn.remat` in place of
torch gradient checkpointing, bf16 compute with fp32 norms.

Submodules are named with the exact torch dotted path (e.g. `input_blocks.1.0`)
so weight import is a mechanical join + transpose (see checkpoint/torch_import.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from neurosis_tpu.modules.attention import SpatialTransformer
from neurosis_tpu.modules.layers import (
    Conv2d,
    Dense,
    Downsample,
    GroupNorm32,
    Upsample,
    gn_conv_fuse_ok,
    timestep_embedding,
)

Dtype = jnp.dtype


class ResBlock(nn.Module):
    """GN→SiLU→conv, +t-emb, GN→SiLU→drop→zero-conv, +skip (openaimodel.py:200-342)."""

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    skip_t_emb: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.skip_t_emb and self.use_scale_shift_norm:
            # reference openaimodel.py:266-269 raises the same
            raise ValueError("skip_t_emb and use_scale_shift_norm are mutually exclusive")
        out_ch = self.out_channels or self.channels
        _fuse_ok = lambda t: gn_conv_fuse_ok(t.shape, out_ch, self.dtype, t.dtype)

        gn_in = GroupNorm32(32, name="in_layers.0")
        conv_in = Conv2d(out_ch, 3, dtype=self.dtype, name="in_layers.2")
        if not (self.up or self.down) and _fuse_ok(x):
            h = conv_in(x, gn_affine=gn_in(x, fold=True))
        else:
            h = nn.silu(gn_in(x))
            if self.up:
                h = _upsample_nearest(h)
                x = _upsample_nearest(x)
            elif self.down:
                h = nn.avg_pool(h, (2, 2), (2, 2))
                x = nn.avg_pool(x, (2, 2), (2, 2))
            h = conv_in(h)

        if self.skip_t_emb:
            emb_out = jnp.zeros_like(h)
        else:
            emb_ch = 2 * out_ch if self.use_scale_shift_norm else out_ch
            e = nn.silu(emb)
            e = Dense(emb_ch, dtype=self.dtype, name="emb_layers.1")(e)
            emb_out = e[:, None, None, :].astype(h.dtype)

        gn_out = GroupNorm32(32, name="out_layers.0")
        conv_out = Conv2d(out_ch, 3, dtype=self.dtype, zero_init=True, name="out_layers.3")
        fuse_out = (self.dropout == 0.0 or deterministic) and _fuse_ok(h)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if fuse_out:
                # gn(h)*(1+scale)+shift folds into the affine:
                # a' = a*(1+scale), b' = b*(1+scale)+shift (per batch, channel)
                a, b = gn_out(h, fold=True)
                s = 1.0 + scale[:, 0, 0, :].astype(jnp.float32)
                a = a * s
                b = b * s + shift[:, 0, 0, :].astype(jnp.float32)
                h = conv_out(h, gn_affine=(a, b))
            else:
                h = gn_out(h) * (1 + scale) + shift
                h = nn.silu(h)
                if self.dropout > 0.0:
                    h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
                h = conv_out(h)
        else:
            h = h + emb_out
            if fuse_out:
                h = conv_out(h, gn_affine=gn_out(h, fold=True))
            else:
                h = gn_out(h)
                h = nn.silu(h)
                if self.dropout > 0.0:
                    h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
                h = conv_out(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = Conv2d(out_ch, 3, dtype=self.dtype, name="skip_connection")(x)
        else:
            skip = Conv2d(out_ch, 1, padding=0, dtype=self.dtype, name="skip_connection")(x)
        return skip + h


def _upsample_nearest(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Timestep(nn.Module):
    """Sinusoid embedder used by ADM 'timestep' label mode (openaimodel.py:451-457)."""

    dim: int

    def __call__(self, t: jax.Array) -> jax.Array:
        return timestep_embedding(t, self.dim)


def _build_layout(
    model_channels: int,
    channel_mult: Sequence[int],
    num_res_blocks: Sequence[int],
    attention_resolutions: Sequence[int],
    num_heads: int,
    num_head_channels: int,
    transformer_depth: Sequence[int],
    num_attention_blocks: Optional[Sequence[int]],
):
    """Compute the static per-block layout (mirrors openaimodel.py:622-801 loops)."""
    input_blocks = [[("conv_in", model_channels)]]
    input_chans = [model_channels]
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for nr in range(num_res_blocks[level]):
            layers = [("res", ch, mult * model_channels)]
            ch = mult * model_channels
            if ds in attention_resolutions and (num_attention_blocks is None or nr < num_attention_blocks[level]):
                nh, dh = _heads(ch, num_heads, num_head_channels)
                layers.append(("attn", ch, nh, dh, transformer_depth[level], level))
            input_blocks.append(layers)
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            input_blocks.append([("down", ch)])
            input_chans.append(ch)
            ds *= 2

    nh, dh = _heads(ch, num_heads, num_head_channels)
    middle = [("res", ch, ch), ("attn", ch, nh, dh, transformer_depth[-1], len(channel_mult) - 1), ("res", ch, ch)]

    output_blocks = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks[level] + 1):
            ich = input_chans.pop()
            layers = [("res", ch + ich, model_channels * mult)]
            ch = model_channels * mult
            if ds in attention_resolutions and (num_attention_blocks is None or i < num_attention_blocks[level]):
                nh, dh = _heads(ch, num_heads, num_head_channels)
                layers.append(("attn", ch, nh, dh, transformer_depth[level], level))
            if level and i == num_res_blocks[level]:
                layers.append(("up", ch))
                ds //= 2
            output_blocks.append(layers)
    return input_blocks, middle, output_blocks


def _heads(ch: int, num_heads: int, num_head_channels: int):
    if num_head_channels == -1:
        return num_heads, ch // num_heads
    return ch // num_head_channels, num_head_channels


class UNetModel(nn.Module):
    """SD/SDXL denoising UNet. Config surface == reference UNetModel init args."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: Union[int, Sequence[int]]
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[Union[int, str]] = None
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    transformer_depth: Union[int, Sequence[int]] = 1
    context_dim: Optional[int] = None
    disable_self_attentions: Optional[Sequence[bool]] = None
    num_attention_blocks: Optional[Sequence[int]] = None
    disable_middle_self_attn: bool = False
    disable_middle_transformer: bool = False
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    context_axis: Optional[str] = None  # ring self-attention mesh axis (seq parallel)
    # transformer-block remat: full | dots | dots_all | names | dots_names |
    # none — one
    # global string, or a per-level sequence (e.g. ["none", "none", "full"]
    # saves level-0/1 activations and remats only the deep level-2 stacks)
    remat_policy: Union[str, Sequence[str]] = "full"
    dtype: Optional[Dtype] = None

    def _res_blocks(self) -> Sequence[int]:
        n = self.num_res_blocks
        return [n] * len(self.channel_mult) if isinstance(n, int) else list(n)

    def _tf_depth(self) -> Sequence[int]:
        d = self.transformer_depth
        return [d] * len(self.channel_mult) if isinstance(d, int) else list(d)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if (y is not None) != (self.num_classes is not None):
            raise ValueError("y must be provided iff num_classes is set")

        time_embed_dim = self.model_channels * 4
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed.0")(t_emb.astype(self.dtype or jnp.float32))
        emb = Dense(time_embed_dim, dtype=self.dtype, name="time_embed.2")(nn.silu(emb))

        if self.num_classes is not None:
            emb = emb + self._label_emb(y, time_embed_dim)

        layout_in, layout_mid, layout_out = _build_layout(
            self.model_channels,
            self.channel_mult,
            self._res_blocks(),
            self.attention_resolutions,
            self.num_heads,
            self.num_head_channels,
            self._tf_depth(),
            self.num_attention_blocks,
        )

        hs = []
        h = x.astype(self.dtype or x.dtype)
        for i, layers in enumerate(layout_in):
            for j, spec in enumerate(layers):
                h = self._apply_layer(spec, h, emb, context, f"input_blocks.{i}.{j}", deterministic)
            hs.append(h)

        for j, spec in enumerate(layout_mid):
            if spec[0] == "attn" and self.disable_middle_transformer:
                continue
            h = self._apply_layer(spec, h, emb, context, f"middle_block.{j}", deterministic, middle=True)

        for i, layers in enumerate(layout_out):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, spec in enumerate(layers):
                h = self._apply_layer(spec, h, emb, context, f"output_blocks.{i}.{j}", deterministic)

        h = h.astype(x.dtype)
        h = GroupNorm32(32, name="out.0")(h)
        h = nn.silu(h)
        return Conv2d(self.out_channels, 3, zero_init=True, name="out.2")(h)

    def _apply_layer(self, spec, h, emb, context, name, deterministic, middle=False):
        kind = spec[0]
        if kind == "conv_in":
            return Conv2d(spec[1], 3, dtype=self.dtype, name=name)(h)
        if kind == "res":
            _, in_ch, out_ch = spec
            return ResBlock(
                channels=in_ch,
                emb_channels=self.model_channels * 4,
                dropout=self.dropout,
                out_channels=out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype,
                name=name,
            )(h, emb, deterministic)
        if kind == "attn":
            _, ch, nh, dh, depth, level = spec
            if middle:
                disable_sa = self.disable_middle_self_attn
            elif self.context_dim is not None and self.disable_self_attentions is not None:
                disable_sa = self.disable_self_attentions[level]
            else:
                disable_sa = False
            policy = self.remat_policy
            if not isinstance(policy, str):
                policy = policy[level]
            return SpatialTransformer(
                in_channels=ch,
                n_heads=nh,
                d_head=dh,
                depth=depth,
                dropout=self.dropout,
                context_dim=self.context_dim,
                disable_self_attn=disable_sa,
                use_linear=self.use_linear_in_transformer,
                use_checkpoint=self.use_checkpoint,
                remat_policy=policy,
                context_axis=self.context_axis,
                dtype=self.dtype,
                name=name,
            )(h, context, deterministic)
        if kind == "down":
            if self.resblock_updown:
                return ResBlock(
                    channels=spec[1],
                    emb_channels=self.model_channels * 4,
                    dropout=self.dropout,
                    out_channels=spec[1],
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    down=True,
                    dtype=self.dtype,
                    name=name,
                )(h, emb, deterministic)
            return Downsample(spec[1], self.conv_resample, dtype=self.dtype, name=name)(h)
        if kind == "up":
            if self.resblock_updown:
                return ResBlock(
                    channels=spec[1],
                    emb_channels=self.model_channels * 4,
                    dropout=self.dropout,
                    out_channels=spec[1],
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    up=True,
                    dtype=self.dtype,
                    name=name,
                )(h, emb, deterministic)
            return Upsample(spec[1], self.conv_resample, dtype=self.dtype, name=name)(h)
        raise ValueError(f"unknown layer kind {kind}")

    def _label_emb(self, y: jax.Array, time_embed_dim: int) -> jax.Array:
        nc = self.num_classes
        if isinstance(nc, int):
            return nn.Embed(nc, time_embed_dim, param_dtype=jnp.float32, name="label_emb")(y)
        if nc == "continuous":
            return Dense(time_embed_dim, dtype=self.dtype, name="label_emb")(y[:, None].astype(self.dtype or jnp.float32))
        if nc == "timestep":
            t = timestep_embedding(y, self.model_channels).astype(self.dtype or jnp.float32)
            e = Dense(time_embed_dim, dtype=self.dtype, name="label_emb.1.0")(t)
            return Dense(time_embed_dim, dtype=self.dtype, name="label_emb.1.2")(nn.silu(e))
        if nc == "sequential":
            # SDXL: y is the 2816-dim concat of pooled text emb + micro-conds
            assert self.adm_in_channels is not None
            e = Dense(time_embed_dim, dtype=self.dtype, name="label_emb.0.0")(y.astype(self.dtype or jnp.float32))
            return Dense(time_embed_dim, dtype=self.dtype, name="label_emb.0.2")(nn.silu(e))
        raise ValueError(f"Unknown num_classes {nc}")
