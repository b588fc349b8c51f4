"""Flax → torch-layout state dict export (scripts/convert/* parity direction)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from .torch_import import flax_path_to_torch_key


def _to_torch_layout(leaf_name: str, w: np.ndarray) -> np.ndarray:
    # ascontiguousarray is load-bearing: safetensors.numpy (≤0.8) serializes
    # the raw buffer of a transposed VIEW, silently corrupting every conv /
    # dense weight in the exported file.
    if leaf_name == "kernel":
        if w.ndim == 4:  # HWIO -> OIHW
            return np.ascontiguousarray(w.transpose(3, 2, 0, 1))
        if w.ndim == 2:  # (in,out) -> (out,in)
            return np.ascontiguousarray(w.T)
        if w.ndim == 3:  # WIO -> OIW
            return np.ascontiguousarray(w.transpose(2, 1, 0))
    return w


def export_torch_state(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        parts = tuple(str(getattr(p, "key", p)) for p in path)
        key = flax_path_to_torch_key(parts, prefix=prefix)
        out[key] = _to_torch_layout(parts[-1], np.asarray(leaf))
    return out
