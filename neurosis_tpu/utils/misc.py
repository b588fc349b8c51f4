"""Small shared utilities (reference: utils/sgm.py, utils/misc.py re-imagined for JAX)."""

from __future__ import annotations

from itertools import islice
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def append_dims(x: Array, target_ndim: int) -> Array:
    """Append trailing singleton dims until ``x.ndim == target_ndim``
    (reference: utils/sgm.py append_dims)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}, which is less")
    return x.reshape(x.shape + (1,) * dims_to_append)


def append_zero(x: Array) -> Array:
    """Append a scalar zero to a 1-D array (reference: utils/sgm.py append_zero)."""
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


def count_params(params: Any) -> int:
    """Total number of scalars in a pytree of arrays (reference: utils/sgm.py count_params)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params) if hasattr(p, "shape"))


_DTYPE_MAP = {
    "f32": jnp.float32,
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "float": jnp.float32,
    "f16": jnp.float16,
    "fp16": jnp.float16,
    "float16": jnp.float16,
    "half": jnp.float16,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "f64": jnp.float64,
    "fp64": jnp.float64,
    "float64": jnp.float64,
    "double": jnp.float64,
    "i8": jnp.int8,
    "int8": jnp.int8,
    "i32": jnp.int32,
    "int32": jnp.int32,
    "i64": jnp.int64,
    "int64": jnp.int64,
    "u8": jnp.uint8,
    "uint8": jnp.uint8,
    "bool": jnp.bool_,
}


def str_to_dtype(name: str | Any) -> Any:
    """Resolve a dtype name string to a jnp dtype (reference: utils/misc.py str_to_dtype)."""
    if not isinstance(name, str):
        return name
    key = name.lower().removeprefix("torch.").removeprefix("jnp.").removeprefix("jax.numpy.")
    if key in _DTYPE_MAP:
        return _DTYPE_MAP[key]
    raise ValueError(f"unknown dtype name: {name!r}")


def batched(iterable: Iterable, n: int) -> Iterator[tuple]:
    """Yield successive n-sized tuples (reference: utils/misc.py batched)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    it = iter(iterable)
    while batch := tuple(islice(it, n)):
        yield batch


def get_nested_attribute(obj: Any, path: str) -> Any:
    """Dotted-path attribute/index lookup (reference: utils/sgm.py get_nested_attribute)."""
    for part in path.split("."):
        if part.isdigit() and not hasattr(obj, part):
            obj = obj[int(part)]
        else:
            obj = getattr(obj, part)
    return obj


def np_text_decode(text, aslist: bool = False):
    """bytes/np.bytes_/ndarray → str (utils/text.py:4-13)."""
    import numpy as np

    if not isinstance(text, list):
        text = [text]
    text = [x.tobytes() if isinstance(x, np.ndarray) else x for x in text]
    text = [x.decode("utf-8") if isinstance(x, (np.bytes_, bytes)) else x for x in text]
    if len(text) == 1 and not aslist:
        return text[0]
    return text


def maybe_collect(threshold: float = 75.0) -> None:
    """GC when RAM use exceeds threshold% (utils/system.py:11-18) — long
    streaming-dataset runs accumulate cycles the allocator never triggers on."""
    import gc

    try:
        import psutil

        used = psutil.virtual_memory().percent
    except ImportError:  # psutil optional: fall back to /proc
        try:
            fields = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    fields[k] = int(v.strip().split()[0])
            used = 100.0 * (1.0 - fields["MemAvailable"] / fields["MemTotal"])
        except Exception:
            return
    if used >= threshold:
        gc.collect()
