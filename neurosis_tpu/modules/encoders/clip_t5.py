"""FrozenCLIPT5Encoder — CLIP-L + T5 combo text embedder.

Parity target: models/text_encoder/clip_t5.py:12-35 — the reference runs the
prompt through both FrozenCLIPEmbedder and FrozenT5Embedder and returns
[clip_z, t5_z]; GeneralConditioner then concatenates the two crossattn
tensors on the feature axis (embedding.py KEY2CATDIM['crossattn']=2).

TPU-native shape: one Flax module with two token inputs (each tokenizer's
ids come pre-tokenized from the host via `token_keys()`), submodules named
`clip_encoder` / `t5_encoder` so reference checkpoints import 1:1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from neurosis_tpu.modules.encoders.embedding import AbstractEmbModel, FrozenCLIPEmbedder

# NOTE: FrozenT5Embedder is imported lazily in __call__ — t5.py itself imports
# this package's `embedding` module, and a module-level import here closes an
# import cycle (t5 → encoders.__init__ → clip_t5 → t5) that breaks whenever
# models.text_encoder.t5 is the first entry point.


class FrozenCLIPT5Encoder(AbstractEmbModel):
    """Two crossattn outputs: CLIP-L last-hidden + T5 encoder states."""

    clip_version: str = "openai/clip-vit-large-patch14"
    t5_version: str = "google/t5-v1_1-xl"
    clip_max_length: int = 77
    t5_max_length: int = 77
    # architecture knobs (reference pulls them from HF configs; explicit here)
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12
    clip_vocab_size: int = 49408
    t5_d_model: int = 2048
    t5_d_kv: int = 64
    t5_d_ff: int = 5120
    t5_num_layers: int = 24
    t5_num_heads: int = 32
    t5_vocab_size: int = 32128
    dtype: Optional[jax.numpy.dtype] = None

    def token_key(self) -> Optional[str]:
        return None  # multi-input: see token_keys()

    def token_keys(self):
        return [f"{self.input_key}_ids", f"{self.input_key}_t5_ids"]

    @nn.compact
    def __call__(self, inputs: Tuple[jax.Array, jax.Array]) -> Tuple[jax.Array, jax.Array]:
        clip_ids, t5_ids = inputs
        clip_z = FrozenCLIPEmbedder(
            version=self.clip_version,
            layer="last",
            max_length=self.clip_max_length,
            vocab_size=self.clip_vocab_size,
            width=self.clip_width,
            layers=self.clip_layers,
            heads=self.clip_heads,
            dtype=self.dtype,
            name="clip_encoder",
        )(clip_ids)[0]
        from neurosis_tpu.models.text_encoder.t5 import FrozenT5Embedder

        t5_z = FrozenT5Embedder(
            version=self.t5_version,
            max_length=self.t5_max_length,
            vocab_size=self.t5_vocab_size,
            d_model=self.t5_d_model,
            d_kv=self.t5_d_kv,
            d_ff=self.t5_d_ff,
            num_layers=self.t5_num_layers,
            num_heads=self.t5_num_heads,
            dtype=self.dtype,
            name="t5_encoder",
        )(t5_ids)[0]
        return (clip_z, t5_z)
