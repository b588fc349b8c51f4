"""Device mesh construction and data/param placement.

Replaces the reference's NCCL-DDP / FSDP strategies (fsdp/diffusionpolicy.py,
SURVEY.md §2.8) with one global Mesh of axes ('data', 'fsdp'):

  - batches shard along 'data' (the AspectDistributedSampler contract moves to
    device placement: each host feeds its own slice, chips split the rest);
  - params/optimizer state shard along 'fsdp' (see fsdp.py);
  - gradient reduction is implicit: jit + shardings → XLA inserts the
    reduce-scatter/all-gather over ICI.

Multi-host: call `init_distributed()` once per process before building the
mesh (jax.distributed, DCN handled by XLA's collective layer).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize for multi-host pods (idempotent)."""
    try:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, fsdp). data=None → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % fsdp:
            raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
        data = n // fsdp
    if data * fsdp != n:
        raise ValueError(f"mesh {data}x{fsdp} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-local batch dict with batch-dim sharding over 'data'."""

    def _put(x):
        x = np.asarray(x)
        spec = P("data") if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    """device_put a param tree according to a PartitionSpec tree."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def unshard(x: Any) -> Any:
    """Gather to host (process-local view)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
