"""Torch-layout checkpoint import into Flax param trees.

The reference stores torch state dicts (safetensors or pickle, models/diffusion.py:127-144);
our Flax modules are NAMED with the exact torch dotted module path (flax allows
'.' in submodule names), so import is a mechanical join:

  flax path ('input_blocks.1.0', 'in_layers.2', 'Conv_0', 'kernel')
  → torch key 'input_blocks.1.0.in_layers.2.weight'  (+ OIHW→HWIO transpose)

Rules:
  - wrapper-internal auto names (Conv_0/Dense_0/GroupNorm_0/Embed_0) are dropped;
  - kernel: 4D conv OIHW→HWIO, 2D dense (out,in)→(in,out); scale/embedding→weight.

Strict-ness contract mirrors init_from_ckpt (models/diffusion.py:135-144):
missing/unexpected keys are returned, not raised.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Tuple

import jax
import numpy as np

_SKIP_COMPONENTS = re.compile(r"^(Conv|Dense|GroupNorm|LayerNorm|Embed)_\d+$")

_LEAF_MAP = {"kernel": "weight", "scale": "weight", "embedding": "weight", "bias": "bias"}


def flax_path_to_torch_key(path: Tuple[str, ...], prefix: str = "") -> str:
    *mods, leaf = [str(p) for p in path]
    mods = [c for c in mods if not _SKIP_COMPONENTS.match(c)]
    leaf = _LEAF_MAP.get(leaf, leaf)
    return prefix + ".".join(mods + [leaf])


def torch_key_to_flax_leaf(leaf: str, torch_tensor: np.ndarray, flax_shape: Tuple[int, ...]) -> np.ndarray:
    """Transpose a torch tensor into the flax layout for the given leaf name."""
    w = np.asarray(torch_tensor)
    if leaf == "kernel":
        if w.ndim == 4:  # conv OIHW -> HWIO
            w = w.transpose(2, 3, 1, 0)
        elif w.ndim == 2:  # dense (out,in) -> (in,out)
            w = w.T
        elif w.ndim == 3:  # conv1d OIW -> WIO
            w = w.transpose(2, 1, 0)
    if tuple(w.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch after transform: torch {w.shape} vs flax {flax_shape}")
    return w


def import_torch_params(
    params_template: Any,
    torch_state: Mapping[str, Any],
    prefix: str = "",
    strict: bool = False,
) -> Tuple[Any, list[str], list[str]]:
    """Fill a flax param tree from a torch state dict.

    Returns (params, missing_keys, unexpected_keys). `params_template` provides
    tree structure/shapes/dtypes (e.g. from ``jax.eval_shape`` of ``init``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)

    used = set()
    missing = []
    leaves = []
    for path, leaf_val in flat:
        path_strs = tuple(_key_str(p) for p in path)
        tkey = flax_path_to_torch_key(path_strs, prefix=prefix)
        if tkey in torch_state:
            w = torch_key_to_flax_leaf(path_strs[-1], _to_numpy(torch_state[tkey]), leaf_val.shape)
            target_dtype = getattr(leaf_val, "dtype", np.float32)
            leaves.append(w.astype(target_dtype))
            used.add(tkey)
        else:
            missing.append(tkey)
            leaves.append(leaf_val)

    unexpected = [k for k in torch_state if k.startswith(prefix) and k not in used]
    if strict and (missing or unexpected):
        raise KeyError(f"strict import failed: missing={missing[:5]}... unexpected={unexpected[:5]}...")
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, missing, unexpected


def _key_str(p) -> str:
    return getattr(p, "key", getattr(p, "name", str(p)))


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)
