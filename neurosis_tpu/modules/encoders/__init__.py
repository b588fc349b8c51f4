"""Conditioning: GeneralConditioner + embedder zoo."""

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
    "FrozenCLIPEmbedder",
    "FrozenOpenCLIPEmbedder2",
    "GeneralConditioner",
    "IdentityEncoder",
    "with_embedder_names",
]
