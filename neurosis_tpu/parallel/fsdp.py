"""FSDP-style parameter sharding rules.

Parity with SDXLFSDPStrategy + DiffusionFsdpPolicy (fsdp/diffusionpolicy.py:
43-146): the reference wraps {UNetModel blocks, SpatialTransformer, TEs, VAE
Encoder/Decoder} for FULL_SHARD. Here the analog is a PartitionSpec per
parameter: shard the LARGEST axis that divides the 'fsdp' mesh axis, replicate
small tensors (norms, biases). XLA then all-gathers just-in-time per layer —
the same communication schedule FSDP implements by hand, but scheduled by the
compiler over ICI.

Mixed precision (SDXLMixedPrecision: bf16 params/reduce with fp32 TE/VAE
islands) maps to module `dtype=bfloat16` + fp32 norm islands already built
into the modules.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

# params smaller than this stay replicated (sharding overhead > win)
MIN_SHARD_SIZE = 2**14


def fsdp_partition_spec(shape, fsdp_size: int, min_size: int = MIN_SHARD_SIZE) -> P:
    """Shard the largest divisible axis along 'fsdp'; else replicate."""
    if fsdp_size <= 1 or np.prod(shape, dtype=np.int64) < min_size:
        return P()
    # prefer the last axis (output features — matches TP-friendly layouts),
    # else any largest divisible axis
    last = len(shape) - 1
    rest = sorted((i for i in range(len(shape)) if i != last), key=lambda i: shape[i], reverse=True)
    for ax in [last] + rest:
        if shape[ax] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def partition_params(params: Any, fsdp_size: int) -> Any:
    """PartitionSpec tree for a param tree."""
    return jax.tree_util.tree_map(lambda p: fsdp_partition_spec(p.shape, fsdp_size), params)
