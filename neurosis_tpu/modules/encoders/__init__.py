"""Conditioning: GeneralConditioner + embedder zoo."""

from .clip_t5 import FrozenCLIPT5Encoder
from .embedding import (
    ConcatTimestepEmbedderND,
    FrozenCLIPEmbedder,
    FrozenOpenCLIPEmbedder2,
    GeneralConditioner,
    IdentityEncoder,
    with_embedder_names,
)

__all__ = [
    "ConcatTimestepEmbedderND",
    "FrozenCLIPT5Encoder",
    "FrozenCLIPEmbedder",
    "FrozenOpenCLIPEmbedder2",
    "GeneralConditioner",
    "IdentityEncoder",
    "with_embedder_names",
]
