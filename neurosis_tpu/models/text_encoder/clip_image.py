"""OpenCLIP vision tower + FrozenOpenCLIPImageEmbedder (parity: clip.py:390-540).

ViT image encoder in open_clip's key layout (visual.conv1/class_embedding/
positional_embedding/ln_pre/transformer.resblocks/ln_post/proj). Preprocessing
(bicubic resize to 224, [-1,1]→[0,1]→CLIP mean/std) replaces kornia with an
exact-torch-semantics matmul resize (ops/resize.py) — all inside jit.
Golden-tested against a torch replica on shared weights
(tests/test_clip_image_parity.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neurosis_tpu.modules.encoders.embedding import AbstractEmbModel

from .clip import _ln

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

Dtype = jnp.dtype


class _ViTBlock(nn.Module):
    width: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _ln(x, "ln_1")
        x = x + _BidirAttention(self.width, self.heads, dtype=self.dtype, name="attn")(h)
        h = _ln(x, "ln_2")
        h = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp.c_proj")(h)


class _BidirAttention(nn.Module):
    """Non-causal MHA with open_clip fused-qkv import naming (q/k/v split)."""

    width: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        d = self.width // self.heads

        def proj(name):
            return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        q = proj("q_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        k = proj("k_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        v = proj("v_proj")(x).reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", weights, v).transpose(0, 2, 1, 3).reshape(b, s, self.width)
        return proj("out_proj")(out)


class OpenCLIPVisionTower(nn.Module):
    """open_clip VisualTransformer; returns (pooled_projected, tokens)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = x.reshape(b, -1, self.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.01), (self.width,), jnp.float32)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (x.shape[1] + 1, self.width),
            jnp.float32,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (b, 1, self.width)).astype(x.dtype), x], 1)
        x = x + pos.astype(x.dtype)

        x = _ln(x, "ln_pre")
        for i in range(self.layers):
            x = _ViTBlock(self.width, self.heads, dtype=self.dtype, name=f"transformer.resblocks.{i}")(x)

        pooled = _ln(x[:, 0], "ln_post")
        tokens = x[:, 1:]
        proj = self.param("proj", nn.initializers.normal(0.01), (self.width, self.output_dim), jnp.float32)
        return pooled @ proj.astype(pooled.dtype), tokens


class FrozenOpenCLIPImageEmbedder(AbstractEmbModel):
    """Image → CLIP embedding cond (clip.py:390-540): resize/renormalize inside
    jit, pooled vector (+ optional tokens), per-sample UCG handled by the
    conditioner."""

    arch: str = "ViT-H-14"
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024
    antialias: bool = True
    unsqueeze_dim: bool = False
    output_tokens: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image: jax.Array) -> Tuple[jax.Array, ...]:
        from neurosis_tpu.ops.resize import bicubic_resize

        # exact kornia.geometry.resize(..., 'bicubic', align_corners=True,
        # antialias) semantics (clip.py:439-451), as two MXU matmuls
        x = bicubic_resize(
            image, (self.image_size, self.image_size), align_corners=True, antialias=self.antialias
        )
        x = (x + 1.0) / 2.0
        x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

        pooled, tokens = OpenCLIPVisionTower(
            image_size=self.image_size,
            patch_size=self.patch_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="model.visual",
        )(x.astype(self.dtype or x.dtype))

        if self.unsqueeze_dim:
            pooled = pooled[:, None, :]
        if self.output_tokens:
            return (pooled, tokens)
        return (pooled,)
