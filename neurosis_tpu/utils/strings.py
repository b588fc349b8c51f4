"""String arrays + param freezing (parity: torch/stringtensor.py:8-38, torch/hooks.py:4).

StringArray: variable-length strings as one padded uint8 array so text rides
device batches (the torch StringTensor trick). freeze_slice: an optax transform
zeroing gradient slices (FreezeSliceHook's grad-mask without module hooks).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np


class StringArray:
    """Pack/unpack strings ↔ padded uint8 matrix."""

    def __init__(self, strings: Sequence[str], max_length: int = 0):
        encoded = [s.encode("utf-8") for s in strings]
        self.max_length = max_length or (max(len(e) for e in encoded) if encoded else 1)
        arr = np.zeros((len(encoded), self.max_length), np.uint8)
        for i, e in enumerate(encoded):
            b = np.frombuffer(e[: self.max_length], np.uint8)
            arr[i, : len(b)] = b
        self.data = arr

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "StringArray":
        obj = cls.__new__(cls)
        obj.data = np.asarray(arr, np.uint8)
        obj.max_length = obj.data.shape[-1]
        return obj

    def to_strings(self) -> list[str]:
        return [bytes(row[row != 0]).decode("utf-8", errors="replace") for row in self.data]

    def __len__(self) -> int:
        return self.data.shape[0]


def freeze_slice(path_substr: str, index: Union[slice, Tuple]):
    """optax transform zeroing grads for a slice of matching params
    (FreezeSliceHook parity — e.g. freeze the first N token embeddings)."""
    import jax
    import optax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def mask(path, u):
            parts = tuple(str(getattr(p, "key", p)) for p in path)
            if any(path_substr in p for p in parts):
                u = u.at[index].set(0)
            return u

        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        leaves = [mask(p, u) for p, u in flat]
        new = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(updates), leaves)
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)
