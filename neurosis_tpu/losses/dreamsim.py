"""DreamSim perceptual metric (parity: modules/losses/dreamsim/{vit,model}.py).

ViT-B/16 feature extractors (timm-style key layout: patch_embed.proj,
cls_token, pos_embed, blocks.N.{norm1,attn.qkv→q/k/v split,attn.proj,norm2,
mlp.fc1,mlp.fc2}, norm, head) + DreamsimModel / DreamsimEnsemble
(dino + clip×2 towers, unit-norm − mean features, 1 − cosine similarity).

Weights load from the converted dreamsim checkpoints at runtime (the reference
fetches from HF hub, dreamsim.py:16+); `split_vit_qkv` maps the fused qkv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DINO_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
DINO_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

Dtype = jnp.dtype


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, eps, name, mdl):
    orig = x.dtype
    out = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)(
        x.astype(jnp.float32)
    )
    return out.astype(orig)


class _ViTAttention(nn.Module):
    dim: int
    num_heads: int = 12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        d = self.dim // self.num_heads

        def proj(name, feats=self.dim, bias=True):
            return nn.Dense(feats, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        # fused torch qkv split into q/k/v at import (split_vit_qkv)
        q = proj("q")(x).reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        k = proj("k")(x).reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        v = proj("v")(x).reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", w, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return proj("proj")(out)


class VisionTransformerB16(nn.Module):
    """DreamSim ViT-B/16 (vit.py:202-357); returns CLS feature (+head)."""

    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0
    pre_norm: bool = False
    act_layer: str = "gelu"
    layer_norm_eps: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, norm: bool = True) -> jax.Array:
        b, in_h, in_w = x.shape[0], x.shape[1], x.shape[2]
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=not self.pre_norm,  # CLIP towers have bias-free patch proj
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed.proj",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim), jnp.float32)
        # pos_embed is NATIVE-resolution sized (image_size/patch + cls) and
        # bicubically interpolated for other input sizes — vit.py:278-302
        # interpolate_pos_encoding, incl. the +0.1 scale-factor fudge
        n_native = (self.image_size // self.patch_size) ** 2
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_native + 1, self.embed_dim), jnp.float32
        )
        pos = _interpolate_pos_encoding(pos, x.shape[1], in_w // self.patch_size, in_h // self.patch_size)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)

        if self.pre_norm:
            x = _ln(x, self.layer_norm_eps, "norm_pre", self)

        act = _quick_gelu if self.act_layer == "quick_gelu" else (lambda v: nn.gelu(v, approximate=False))
        hidden = int(self.embed_dim * self.mlp_ratio)
        for i in range(self.depth):
            p = f"blocks.{i}"
            h = _ln(x, self.layer_norm_eps, f"{p}.norm1", self)
            x = x + _ViTAttention(self.embed_dim, self.num_heads, dtype=self.dtype, name=f"{p}.attn")(h)
            h = _ln(x, self.layer_norm_eps, f"{p}.norm2", self)
            h = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name=f"{p}.mlp.fc1")(h)
            h = act(h)
            x = x + nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"{p}.mlp.fc2")(h)

        if norm:
            x = _ln(x, self.layer_norm_eps, "norm", self)
        feat = x[:, 0]
        if self.num_classes > 0:
            # reference head is nn.Linear WITH bias (vit.py:269); the CLIP
            # converter synthesizes a zero bias when absent (utils.py:112-113)
            feat = nn.Dense(
                self.num_classes, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="head"
            )(feat)
        return feat


def _interpolate_pos_encoding(pos: jax.Array, npatch: int, w0_patches: int, h0_patches: int) -> jax.Array:
    """vit.py:278-302 interpolate_pos_encoding: keep the CLS slot, bicubically
    resample the native patch grid to the input's grid with torch
    `F.interpolate(scale_factor=(h0+0.1)/√N)` semantics (exact ATen filter via
    ops/resize.bicubic_resize scale override)."""
    import math

    n = pos.shape[1] - 1
    if npatch == n and w0_patches == h0_patches:
        return pos
    from neurosis_tpu.ops.resize import bicubic_resize

    dim = pos.shape[-1]
    gs = int(math.sqrt(n))
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:].reshape(1, gs, gs, dim)
    # the reference adds 0.1 to the target grid before forming the scale
    # factor (vit.py:293 — "avoid floating point error"); ATen then maps
    # coordinates with 1/scale_factor, so the override is gs/(h0+0.1)
    h0, w0 = h0_patches + 0.1, w0_patches + 0.1
    out = bicubic_resize(
        patch_pos,
        (h0_patches, w0_patches),
        align_corners=False,
        antialias=False,
        scales=(gs / h0, gs / w0),
    )
    if out.shape[1] != h0_patches or out.shape[2] != w0_patches:
        raise ValueError("Error in positional encoding interpolation.")
    return jnp.concatenate([cls_pos, out.reshape(1, -1, dim)], axis=1)


def _unit_center(z: jax.Array) -> jax.Array:
    z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
    return z - jnp.mean(z, axis=1, keepdims=True)


class DreamsimModel(nn.Module):
    """Single-tower variant (model.py:34-90)."""

    pre_norm: bool = False
    act_layer: str = "gelu"
    layer_norm_eps: float = 1e-6
    do_resize: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [2, B, H, W, 3] in [0,1] → dreamsim distance [B]."""
        pair = x.reshape((-1,) + x.shape[2:])
        if self.do_resize:
            pair = jax.image.resize(pair, (pair.shape[0], 224, 224, 3), "bicubic", antialias=True)
        pair = (pair - jnp.asarray(DINO_MEAN)) / jnp.asarray(DINO_STD)
        feats = VisionTransformerB16(
            num_classes=512 if self.pre_norm else 0,
            pre_norm=self.pre_norm,
            act_layer=self.act_layer,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            name="extractor",
        )(pair, norm=self.pre_norm)
        z = _unit_center(feats).reshape(x.shape[0], x.shape[1], -1)
        cos = jnp.sum(z[0] * z[1], axis=1) / (
            jnp.linalg.norm(z[0], axis=1) * jnp.linalg.norm(z[1], axis=1) + 1e-8
        )
        return 1.0 - cos


class DreamsimEnsemble(nn.Module):
    """dino + clip1(quick_gelu) + clip2(gelu) ensemble (model.py:92-173)."""

    layer_norm_eps: Tuple[float, float, float] = (1e-6, 1e-5, 1e-5)
    num_classes: Tuple[int, int, int] = (0, 512, 512)
    do_resize: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [2, B, H, W, 3] in [0,1] → dreamsim distance [B]."""
        pair = x.reshape((-1,) + x.shape[2:])
        if self.do_resize:
            pair = jax.image.resize(pair, (pair.shape[0], 224, 224, 3), "bicubic", antialias=True)

        x_dino = (pair - jnp.asarray(DINO_MEAN)) / jnp.asarray(DINO_STD)
        x_clip = (pair - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

        f_dino = VisionTransformerB16(
            num_classes=self.num_classes[0], pre_norm=False, act_layer="gelu",
            layer_norm_eps=self.layer_norm_eps[0], dtype=self.dtype, name="dino",
        )(x_dino, norm=False)
        f_clip1 = VisionTransformerB16(
            num_classes=self.num_classes[1], pre_norm=True, act_layer="quick_gelu",
            layer_norm_eps=self.layer_norm_eps[1], dtype=self.dtype, name="clip1",
        )(x_clip, norm=True)
        f_clip2 = VisionTransformerB16(
            num_classes=self.num_classes[2], pre_norm=True, act_layer="gelu",
            layer_norm_eps=self.layer_norm_eps[2], dtype=self.dtype, name="clip2",
        )(x_clip, norm=True)

        z = jnp.concatenate([f_dino, f_clip1, f_clip2], axis=1)
        z = _unit_center(z).reshape(x.shape[0], x.shape[1], -1)
        cos = jnp.sum(z[0] * z[1], axis=1) / (
            jnp.linalg.norm(z[0], axis=1) * jnp.linalg.norm(z[1], axis=1) + 1e-8
        )
        return 1.0 - cos


def split_vit_qkv(state_dict: dict) -> dict:
    """Split timm fused `attn.qkv.{weight,bias}` into q/k/v for import."""
    out = {}
    for k, v in state_dict.items():
        if ".attn.qkv." in k:
            suffix = k.rsplit(".", 1)[-1]
            base = k.rsplit("qkv." + suffix, 1)[0]
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[f"{base}q.{suffix}"] = q
            out[f"{base}k.{suffix}"] = kk
            out[f"{base}v.{suffix}"] = vv
        else:
            out[k] = v
    return out


class AutoencoderDreamsim(nn.Module):
    """VAE loss: recon + DreamSim distance (autoencoding/losses/dreamsim.py:16+)."""

    recon_type: str = "l1"
    recon_weight: float = 1.0
    dreamsim_weight: float = 1.0
    ensemble: bool = True

    @nn.compact
    def __call__(self, inputs: jax.Array, recons: jax.Array, split: str = "train"):
        axes = tuple(range(1, inputs.ndim))
        if self.recon_type in ("l2", "mse"):
            rec = jnp.mean((inputs - recons) ** 2, axis=axes)
        else:
            rec = jnp.mean(jnp.abs(inputs - recons), axis=axes)

        # dreamsim expects [0,1] 224px pairs
        pair = jnp.stack([(inputs + 1) / 2, (recons + 1) / 2])
        model = (DreamsimEnsemble if self.ensemble else DreamsimModel)(do_resize=True, name="dreamsim")
        dist = model(pair)

        loss = rec * self.recon_weight + dist * self.dreamsim_weight
        log = {
            f"{split}/loss/total": jnp.mean(loss),
            f"{split}/loss/rec": jnp.mean(rec),
            f"{split}/loss/dreamsim": jnp.mean(dist),
        }
        return loss, log
