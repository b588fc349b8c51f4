"""GeneralConditioner and embedders (parity: modules/encoders/embedding.py, metadata.py, clip.py).

JAX redesign: tokenization happens host-side in the data pipeline (captions →
`caption_ids` int32 [B, 77] or [B, chunks, 77] for extended mode); everything
here is jit-compatible, consuming numeric batch dicts and an explicit PRNG key.

Routing parity (embedding.py:59-149):
  - embedder output ndim → cond key: 2→'vector', 3→'crossattn', 4/5→'concat'
  - concat dims: vector→axis 1, crossattn→axis 2 (CLIP-L 768 ⊕ bigG 1280 →
    2048), concat→channel axis (−1 in NHWC, reference uses 1 in NCHW)
  - caption UCG: batch-level swap to the empty prompt with prob ucg_rate
    (clip.py:93-95); non-caption UCG: per-sample Bernoulli zeroing
    (embedding.py:138-143); force_zero_embeddings supported.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neurosis_tpu.models.text_encoder import CLIPTextTower, OpenCLIPTextTower
from neurosis_tpu.modules.layers import timestep_embedding

Dtype = jnp.dtype

# cond-dict routing tables (embedding.py:60-61); concat is NHWC here
OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
KEY2CATDIM = {"vector": 1, "crossattn": 2, "concat": -1}


class AbstractEmbModel(nn.Module):
    """Base embedder: pulls `input_key` from the batch, emits cond tensors.

    Matches AbstractEmbModel (embedding.py:17-56): name/input_key/ucg_rate/
    is_trainable/base_lr are config; freezing is a train-step decision
    (stop_gradient / optimizer masking), not module state.
    """

    input_key: str = "caption"
    ucg_rate: float = 0.0
    is_trainable: bool = False
    base_lr: Optional[float] = None
    emb_name: Optional[str] = None

    def token_key(self) -> Optional[str]:
        """Batch key holding this embedder's tokenized input (None = numeric)."""
        return None

    def token_keys(self) -> Optional[list]:
        """Multiple token streams (multi-tokenizer embedders); None = single."""
        return None


class FrozenCLIPEmbedder(AbstractEmbModel):
    """HF CLIP-L text encoder embedder (clip.py:22-196).

    layer: 'last' | 'pooled' | 'hidden' | 'penultimate'. hidden/penultimate
    select hidden_states[layer_idx+1] (0 = embeddings). extended_chunks>1
    expects ids [B, chunks, 77] and concatenates chunk outputs on seq axis.
    """

    version: str = "openai/clip-vit-large-patch14"
    max_length: int = 77
    layer: str = "last"
    layer_idx: Optional[int] = None
    always_return_pooled: bool = False
    extended_chunks: int = 0
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    dtype: Optional[Dtype] = None

    def token_key(self) -> str:
        return f"{self.input_key}_ids"

    def _select_layer_idx(self) -> int:
        if self.layer == "penultimate":
            return 10
        if self.layer == "hidden":
            idx = self.layer_idx
            if idx is None:
                raise ValueError("layer_idx must be specified for hidden layer")
            return idx + self.layers if idx < 0 else idx
        return -1

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, ...]:
        tower = CLIPTextTower(
            vocab_size=self.vocab_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            max_positions=self.max_length,
            dtype=self.dtype,
            name="transformer",
        )
        chunked = input_ids.ndim == 3
        if chunked:
            b, n_chunks, seq = input_ids.shape
            flat_ids = input_ids.reshape(b * n_chunks, seq)
        else:
            flat_ids = input_ids

        out = tower(flat_ids)
        if self.layer == "last":
            z = out["last_hidden_state"]
        elif self.layer == "pooled":
            z = out["pooler_output"][:, None, :]
        else:
            z = out["hidden_states"][self._select_layer_idx() + 1]

        if chunked:
            z = z.reshape(b, n_chunks * z.shape[1], z.shape[-1])
            pooled = out["pooler_output"].reshape(b, n_chunks, -1)[:, 0]
        else:
            pooled = out["pooler_output"]

        if self.always_return_pooled:
            return (z, pooled)
        return (z,)


class FrozenOpenCLIPEmbedder2(AbstractEmbModel):
    """OpenCLIP bigG text embedder (clip.py:205-360).

    layer: 'last' | 'penultimate' (pre-ln_final resblock outputs); pooled =
    ln_final(last)[argmax ids] @ text_projection.
    """

    arch: str = "ViT-bigG-14"
    version: Optional[str] = None
    max_length: int = 77
    layer: str = "penultimate"
    always_return_pooled: bool = False
    legacy: bool = False
    extended_chunks: int = 0
    vocab_size: int = 49408
    width: int = 1280
    layers: int = 32
    heads: int = 20
    dtype: Optional[Dtype] = None

    def token_key(self) -> str:
        return f"{self.input_key}_ids"

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, ...]:
        tower = OpenCLIPTextTower(
            vocab_size=self.vocab_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            max_positions=self.max_length,
            dtype=self.dtype,
            name="model",
        )
        chunked = input_ids.ndim == 3
        if chunked:
            b, n_chunks, seq = input_ids.shape
            flat_ids = input_ids.reshape(b * n_chunks, seq)
        else:
            flat_ids = input_ids

        out = tower(flat_ids)
        if self.legacy:
            # legacy: ln_final applied to the selected layer, no pooled
            z = out["last_ln"] if self.layer == "last" else out["penultimate"]
            return (z,)
        z = out["last"] if self.layer == "last" else out["penultimate"]

        if chunked:
            z = z.reshape(b, n_chunks * z.shape[1], z.shape[-1])
            pooled = out["pooled"].reshape(b, n_chunks, -1)[:, 0]
        else:
            pooled = out["pooled"]

        if self.always_return_pooled:
            return (z, pooled)
        return (z,)


class ConcatTimestepEmbedderND(AbstractEmbModel):
    """Each scalar of an [B, n] metadata tensor → `outdim` Fourier features,
    concatenated → [B, n*outdim] vector cond (metadata.py:14-36)."""

    outdim: int = 256

    def __call__(self, x: jax.Array) -> Tuple[jax.Array]:
        if x.ndim == 1:
            x = x[:, None]
        b, dims = x.shape
        emb = timestep_embedding(x.reshape(b * dims), self.outdim)
        return (emb.reshape(b, dims * self.outdim),)


class IdentityEncoder(AbstractEmbModel):
    """Pass-through (misc.py:6)."""

    def __call__(self, x: jax.Array) -> Tuple[jax.Array]:
        return (x,)


def with_embedder_names(embedders: Sequence[AbstractEmbModel]) -> tuple:
    """Name embedders 'embedders.N' so params import as 'conditioner.embedders.N.*'
    (the reference's ModuleList key layout, embedding.py:88)."""
    import dataclasses

    out = []
    for i, e in enumerate(embedders):
        out.append(dataclasses.replace(e, name=f"embedders.{i}") if e.name is None else e)
    return tuple(out)


def _uncond_key(token_key: str, input_key: str) -> str:
    """'caption_t5_ids' → 'uncond_t5_ids' (falls back to 'uncond_ids')."""
    suffix = token_key[len(input_key):] if token_key.startswith(input_key) else "_ids"
    return f"uncond{suffix}"


class GeneralConditioner(nn.Module):
    """Routes embedder outputs into {'vector','crossattn','concat'} cond dicts.

    Parity: embedding.py:59-149. `embedders` is a sequence of AbstractEmbModel
    linen modules. `__call__(batch, rng, force_zero_embeddings)`:
      - text embedders read `batch[f'{input_key}_ids']` (host-tokenized);
        caption UCG swaps the whole batch to `batch['uncond_ids']` with prob
        ucg_rate (one draw per embedder, clip.py:93-95 semantics);
      - numeric embedders read `batch[input_key]`; UCG zeroes per-sample.
    Pass rng=None for deterministic (eval) behavior — all UCG disabled, which
    is `zero_ucg()` (embedding.py:151-163).
    """

    embedders: Sequence[AbstractEmbModel] = ()

    @nn.compact
    def __call__(
        self,
        batch: dict,
        rng: Optional[jax.Array] = None,
        force_zero_embeddings: Sequence[str] = (),
    ) -> dict:
        output: dict[str, jax.Array] = {}
        for idx, embedder in enumerate(self.embedders):
            tkey = embedder.token_key()
            tkeys = embedder.token_keys() if hasattr(embedder, "token_keys") else None
            if tkeys is not None:
                # multi-tokenizer embedder (FrozenCLIPT5Encoder): one UCG draw
                # swaps ALL token streams to their uncond rows together
                inputs = tuple(batch[k] for k in tkeys)
                if rng is not None and embedder.ucg_rate > 0.0:
                    rng, sub = jax.random.split(rng)
                    swap = jax.random.uniform(sub) < embedder.ucg_rate
                    inputs = tuple(
                        jnp.where(
                            swap,
                            jnp.broadcast_to(
                                batch.get(_uncond_key(k, embedder.input_key), batch["uncond_ids"]),
                                x.shape,
                            ),
                            x,
                        )
                        for k, x in zip(tkeys, inputs)
                    )
                tkey = tkeys[0]  # token-style UCG already applied above
            elif tkey is not None:
                inputs = batch[tkey]
                if rng is not None and embedder.ucg_rate > 0.0:
                    rng, sub = jax.random.split(rng)
                    swap = jax.random.uniform(sub) < embedder.ucg_rate
                    uncond = jnp.broadcast_to(batch["uncond_ids"], inputs.shape)
                    inputs = jnp.where(swap, uncond, inputs)
            else:
                inputs = batch[embedder.input_key]

            emb_out = embedder(inputs)
            for emb in emb_out:
                out_key = OUTPUT_DIM2KEYS[emb.ndim]
                if embedder.input_key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                elif rng is not None and embedder.ucg_rate > 0.0 and tkey is None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1.0 - embedder.ucg_rate, (emb.shape[0],))
                    emb = emb * keep.reshape((-1,) + (1,) * (emb.ndim - 1)).astype(emb.dtype)

                if out_key in output:
                    output[out_key] = jnp.concatenate([output[out_key], emb], axis=KEY2CATDIM[out_key])
                else:
                    output[out_key] = emb
        return output

    def get_unconditional_conditioning(
        self,
        params: Any,
        batch_c: dict,
        batch_uc: Optional[dict] = None,
        force_uc_zero_embeddings: Sequence[str] = (),
        force_cond_zero_embeddings: Sequence[str] = (),
    ) -> Tuple[dict, dict]:
        """Build (cond, uncond) pairs for CFG sampling (embedding.py:165-183)."""
        c = self.apply(params, batch_c, rng=None, force_zero_embeddings=force_cond_zero_embeddings)
        if batch_uc is None:
            batch_uc = dict(batch_c)
            for embedder in self.embedders:
                tkeys = embedder.token_keys() or (
                    [embedder.token_key()] if embedder.token_key() else []
                )
                for tkey in tkeys:
                    if tkey in batch_uc:
                        unc = batch_c.get(_uncond_key(tkey, embedder.input_key), batch_c["uncond_ids"])
                        batch_uc[tkey] = jnp.broadcast_to(unc, batch_c[tkey].shape)
        uc = self.apply(params, batch_uc, rng=None, force_zero_embeddings=force_uc_zero_embeddings)
        return c, uc
