"""Distribution: device mesh, FSDP partition specs, multi-host init."""

from .mesh import init_distributed, make_mesh, shard_batch, shard_params, shard_state, unshard
from .fsdp import fsdp_partition_spec, partition_params

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "shard_params",
    "shard_state",
    "unshard",
    "fsdp_partition_spec",
    "partition_params",
]
