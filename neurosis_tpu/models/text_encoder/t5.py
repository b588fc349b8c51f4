"""T5/ByT5 text encoders (parity: models/text_encoder/t5.py:14-103).

Own Flax T5 encoder (v1.0 relu and v1.1/byt5 gated-gelu variants): RMSNorm,
bias-free projections, unscaled attention with shared relative position bias.
Submodules named with HF's torch key layout (encoder.block.N.layer.0.
SelfAttention.q ...) for 1:1 weight import.

ByT5 tokenization is byte-level (utf-8 + 3 special offset) — implemented here,
no vocab files needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neurosis_tpu.modules.encoders.embedding import AbstractEmbModel

Dtype = jnp.dtype


class RMSNorm(nn.Module):
    """T5 LayerNorm: scale-only RMS, fp32 accumulation."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x**2, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("weight", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32)
        return (x * scale).astype(orig)


def _rel_pos_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional relative-position bucketing (HF T5 parity)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class _T5SelfAttention(nn.Module):
    d_model: int
    heads: int
    d_kv: int
    has_rel_bias: bool = False
    num_buckets: int = 32
    max_distance: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, pos_bias: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        b, s, _ = x.shape
        inner = self.heads * self.d_kv

        def proj(name):
            return nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        q = proj("q")(x).reshape(b, s, self.heads, self.d_kv).transpose(0, 2, 1, 3)
        k = proj("k")(x).reshape(b, s, self.heads, self.d_kv).transpose(0, 2, 1, 3)
        v = proj("v")(x).reshape(b, s, self.heads, self.d_kv).transpose(0, 2, 1, 3)

        # T5 does NOT scale by 1/sqrt(d)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)

        if self.has_rel_bias:
            rel_emb = nn.Embed(
                self.num_buckets, self.heads, param_dtype=jnp.float32, name="relative_attention_bias"
            )
            ctx = jnp.arange(s)[:, None]
            mem = jnp.arange(s)[None, :]
            buckets = _rel_pos_bucket(mem - ctx, self.num_buckets, self.max_distance)
            pos_bias = rel_emb(buckets).transpose(2, 0, 1)[None]  # (1, h, s, s)
        if pos_bias is not None:
            logits = logits + pos_bias

        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="o")(out)
        return out, pos_bias


class T5EncoderModel(nn.Module):
    """HF-layout T5 encoder stack."""

    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_heads: int = 12
    gated_act: bool = True  # v1.1/byt5 gated-gelu; False → v1.0 relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        shared = nn.Embed(self.vocab_size, self.d_model, param_dtype=jnp.float32, name="shared")
        x = shared(input_ids).astype(self.dtype or jnp.float32)

        pos_bias = None
        for i in range(self.num_layers):
            p = f"encoder.block.{i}"
            h = RMSNorm(name=f"{p}.layer.0.layer_norm")(x)
            attn_out, pos_bias = _T5SelfAttention(
                d_model=self.d_model,
                heads=self.num_heads,
                d_kv=self.d_kv,
                has_rel_bias=(i == 0),
                dtype=self.dtype,
                name=f"{p}.layer.0.SelfAttention",
            )(h, pos_bias)
            x = x + attn_out

            h = RMSNorm(name=f"{p}.layer.1.layer_norm")(x)
            if self.gated_act:
                g = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{p}.layer.1.DenseReluDense.wi_0")(h)
                u = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{p}.layer.1.DenseReluDense.wi_1")(h)
                h = nn.gelu(g, approximate=True) * u
            else:
                h = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{p}.layer.1.DenseReluDense.wi")(h)
                h = nn.relu(h)
            h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{p}.layer.1.DenseReluDense.wo")(h)
            x = x + h

        return RMSNorm(name="encoder.final_layer_norm")(x)


class FrozenT5Embedder(AbstractEmbModel):
    """T5-XXL-style text embedder (t5.py:14-58); crossattn cond."""

    version: str = "google/t5-v1_1-xxl"
    max_length: int = 77
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_heads: int = 12
    dtype: Optional[Dtype] = None

    def token_key(self) -> str:
        return f"{self.input_key}_t5_ids"

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array]:
        z = T5EncoderModel(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            d_kv=self.d_kv,
            d_ff=self.d_ff,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="transformer",
        )(input_ids)
        return (z,)


class FrozenByT5Embedder(FrozenT5Embedder):
    """Byte-level T5 (t5.py:60-103); vocab = 256 bytes + 3 specials + extras."""

    version: str = "google/byt5-small"
    vocab_size: int = 384
    d_model: int = 1472
    d_kv: int = 64
    d_ff: int = 3584
    num_layers: int = 12
    num_heads: int = 6


def byt5_tokenize(texts, max_length: int = 77) -> np.ndarray:
    """ByT5 tokenization: utf-8 bytes + 3 (0=pad, 1=eos, 2=unk)."""
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        ids = [b + 3 for b in t.encode("utf-8")][: max_length - 1] + [1]
        out[i, : len(ids)] = ids
    return out
