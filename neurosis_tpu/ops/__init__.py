"""Hot-path compute ops: attention (Pallas flash kernels on TPU + XLA fallback)."""

from .attention import dot_product_attention

__all__ = ["dot_product_attention"]
