"""CLIP text towers in Flax: HF CLIP-L layout and OpenCLIP (bigG) layout.

Behavioral parity targets:
  - FrozenCLIPEmbedder (models/text_encoder/clip.py:22-196): HF CLIPTextModel
    with `hidden_states[layer_idx+1]` selection and argmax-EOS pooling.
  - FrozenOpenCLIPEmbedder2 (models/text_encoder/clip.py:205-360): manual
    resblock walk capturing `penultimate` (input to the last block), final LN,
    pooled = ln_final(last)[argmax(ids)] @ text_projection.

Both are pre-LN causal transformers; the only differences are naming (for
weight import), activation (quick_gelu vs gelu), and the text projection.
Submodule names mirror the respective torch key layouts exactly.

TPU notes: frozen encoders run in bf16 under jit; LayerNorms compute fp32
(`_layer_norm` in modules/attention.py pattern). Sequences are 77 tokens — the
XLA fused attention path is optimal; no Pallas needed here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neurosis_tpu.modules.layers import Dense

Dtype = jnp.dtype


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x: jax.Array, name: str) -> jax.Array:
    orig = x.dtype
    out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)(
        x.astype(jnp.float32)
    )
    return out.astype(orig)


class _CausalSelfAttention(nn.Module):
    """MHA with bias, causal mask, separate q/k/v projections."""

    width: int
    heads: int
    dtype: Optional[Dtype] = None
    # names of the four projection submodules (HF vs open_clip layouts)
    names: Sequence[str] = ("q_proj", "k_proj", "v_proj", "out_proj")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        d = self.width // self.heads
        qn, kn, vn, on = self.names
        q = Dense(self.width, dtype=self.dtype, name=qn)(x)
        k = Dense(self.width, dtype=self.dtype, name=kn)(x)
        v = Dense(self.width, dtype=self.dtype, name=vn)(x)

        q = q.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        scale = 1.0 / np.sqrt(d)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) * scale
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        logits = jnp.where(causal[None, None], logits, jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        return Dense(self.width, dtype=self.dtype, name=on)(out)


class CLIPTextTower(nn.Module):
    """HF-layout CLIP text model (CLIPTextModel parity, quick_gelu).

    Returns dict with 'hidden_states' (list, [0]=embeddings, [i]=output of
    layer i, pre-final-LN), 'last_hidden_state' (post final LN) and
    'pooler_output' (last_hidden_state at argmax token id — EOS is the highest
    CLIP token id, HF CLIPTextModel pooling).
    """

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> dict:
        b, s = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.width, param_dtype=jnp.float32, name="text_model.embeddings.token_embedding"
        )(input_ids)
        pos = nn.Embed(
            self.max_positions, self.width, param_dtype=jnp.float32, name="text_model.embeddings.position_embedding"
        )(jnp.arange(s)[None, :])
        x = (tok + pos).astype(self.dtype or tok.dtype)

        hidden_states = [x]
        for i in range(self.layers):
            p = f"text_model.encoder.layers.{i}"
            h = _ln(x, name=f"{p}.layer_norm1")
            x = x + _CausalSelfAttention(
                self.width, self.heads, dtype=self.dtype, name=f"{p}.self_attn"
            )(h)
            h = _ln(x, name=f"{p}.layer_norm2")
            h = Dense(self.width * 4, dtype=self.dtype, name=f"{p}.mlp.fc1")(h)
            h = quick_gelu(h)
            x = x + Dense(self.width, dtype=self.dtype, name=f"{p}.mlp.fc2")(h)
            hidden_states.append(x)

        last = _ln(x, name="text_model.final_layer_norm")
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eos_idx]
        return {"hidden_states": hidden_states, "last_hidden_state": last, "pooler_output": pooled}


class OpenCLIPTextTower(nn.Module):
    """open_clip-layout text tower (ViT-bigG: width 1280, 32 layers, 20 heads).

    Returns dict with 'penultimate' (input to the last resblock, NLD),
    'last' (after all blocks, pre-LN), 'last_ln' (post ln_final) and
    'pooled' (ln_final output at argmax(ids) @ text_projection) — matching
    FrozenOpenCLIPEmbedder2.encode_with_transformer/pool.
    """

    vocab_size: int = 49408
    width: int = 1280
    layers: int = 32
    heads: int = 20
    max_positions: int = 77
    projection_dim: Optional[int] = None  # defaults to width
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> dict:
        b, s = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, param_dtype=jnp.float32, name="token_embedding")(input_ids)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.max_positions, self.width),
            jnp.float32,
        )
        x = (tok + pos_emb[None, :s]).astype(self.dtype or tok.dtype)

        penultimate = None
        for i in range(self.layers):
            if i == self.layers - 1:
                penultimate = x
            p = f"transformer.resblocks.{i}"
            h = _ln(x, name=f"{p}.ln_1")
            x = x + _CausalSelfAttention(
                self.width,
                self.heads,
                dtype=self.dtype,
                names=("attn.q_proj", "attn.k_proj", "attn.v_proj", "attn.out_proj"),
                name=p,
            )(h)
            h = _ln(x, name=f"{p}.ln_2")
            h = Dense(self.width * 4, dtype=self.dtype, name=f"{p}.mlp.c_fc")(h)
            h = nn.gelu(h, approximate=False)
            x = x + Dense(self.width, dtype=self.dtype, name=f"{p}.mlp.c_proj")(h)

        last = x
        last_ln = _ln(x, name="ln_final")
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.01),
            (self.width, self.projection_dim or self.width),
            jnp.float32,
        )
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = last_ln[jnp.arange(b), eos_idx] @ proj.astype(last_ln.dtype)
        return {"penultimate": penultimate, "last": last, "last_ln": last_ln, "pooled": pooled}


def split_openclip_qkv(state_dict: dict) -> dict:
    """Split open_clip fused `attn.in_proj_*` into q/k/v for import.

    open_clip stores nn.MultiheadAttention fused (3*width, width) weights;
    our tower has separate projections.
    """
    out = {}
    for k, v in state_dict.items():
        if k.endswith("attn.in_proj_weight") or k.endswith("attn.in_proj_bias"):
            base = k.rsplit("attn.in_proj_", 1)
            suffix = "weight" if k.endswith("weight") else "bias"
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[f"{base[0]}attn.q_proj.{suffix}"] = q
            out[f"{base[0]}attn.k_proj.{suffix}"] = kk
            out[f"{base[0]}attn.v_proj.{suffix}"] = vv
        else:
            out[k] = v
    return out
