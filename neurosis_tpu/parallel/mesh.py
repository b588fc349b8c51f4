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

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


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
    context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, fsdp[, context]). data=None → all remaining devices.

    context > 1 adds a third axis for ring-attention sequence parallelism
    (ops/attention.py context_axis dispatch); batches stay sharded along
    'data' only — the attention shard_map re-shards S over 'context' in-graph,
    so the axis composes freely with data/fsdp. The axis is appended only when
    used, keeping the 2-axis shape for existing (data, fsdp) consumers.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    context = int(context or 1)
    if data is None:
        if n % (fsdp * context):
            raise ValueError(f"{n} devices not divisible by fsdp={fsdp} x context={context}")
        data = n // (fsdp * context)
    if data * fsdp * context != n:
        raise ValueError(f"mesh {data}x{fsdp}x{context} != {n} devices")
    if context > 1:
        arr = np.asarray(devices).reshape(data, fsdp, context)
        return Mesh(arr, ("data", "fsdp", "context"))
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def shard_batch(mesh: Mesh, batch: Any, data_axis: str = "data") -> Any:
    """Place a batch dict with batch-dim sharding over the data axis.

    Arrays whose leading dim doesn't divide the data-axis size (e.g. the
    singleton `uncond_ids` row) are replicated. Multi-host: the input is this
    process's local slice (the rank-strided sampler contract,
    dataset/aspect/sampler.py:27-87) and `make_array_from_process_local_data`
    assembles the global array.
    """
    data_size = mesh.shape[data_axis]
    multihost = jax.process_count() > 1
    # multi-host: each process holds 1/process_count of the batch, so the
    # shardability check is against the PER-PROCESS share of the data axis
    # (comparing the local dim to the global axis size would mis-classify
    # every batch array as replicated on a pod)
    local_data = data_size // jax.process_count() if multihost else data_size
    local_data = max(local_data, 1)
    # batch arrays all share the (local) batch size = the max leading dim;
    # smaller leading dims (singleton uncond rows, per-batch metadata) are
    # replicated — divisibility alone would misclassify them whenever
    # local_data degenerates to 1 (data axis ≤ process count)
    leading = [
        np.shape(leaf)[0]
        for leaf in jax.tree_util.tree_leaves(batch)
        if np.ndim(leaf) >= 1
    ]
    local_bs = max(leading) if leading else 0

    def _put(x):
        x = np.asarray(x)
        if (
            x.ndim >= 1
            and x.shape[0] == local_bs
            and x.shape[0] >= local_data
            and x.shape[0] % local_data == 0
        ):
            spec = P(data_axis)
        else:
            if (
                x.ndim >= 1
                and x.shape[0] != local_bs
                and x.shape[0] >= local_data
                and x.shape[0] % local_data == 0
            ):
                # A leaf that looks shardable (divisible leading dim) but
                # doesn't match the batch size is demoted to replicated —
                # surface it: on multi-host, replicated placement of
                # per-process-DIFFERENT data via make_array_from_process_local_data
                # would be silently incorrect.
                logger.warning(
                    "shard_batch: leaf with leading dim %d != batch size %d "
                    "replicated over the mesh; verify it is identical across "
                    "processes on multi-host runs",
                    x.shape[0],
                    local_bs,
                )
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    """device_put a param tree according to a PartitionSpec tree."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_state(mesh: Mesh, state: Any, fsdp_size: int) -> Any:
    """Shard a whole train-state pytree (params, opt_state, EMA, scalars).

    Every leaf gets the shape-driven fsdp spec (fsdp.py) — optimizer moments
    share their param's shape so they land on the same shards (the FULL_SHARD
    opt-state sharding of SDXLFSDPStrategy, fsdp/diffusionpolicy.py:108-146);
    scalars/small tensors replicate.
    """
    from neurosis_tpu.parallel.fsdp import fsdp_partition_spec

    def _put(leaf):
        spec = fsdp_partition_spec(getattr(leaf, "shape", ()), fsdp_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, state)


def unshard(x: Any) -> Any:
    """Gather to host (process-local view)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
