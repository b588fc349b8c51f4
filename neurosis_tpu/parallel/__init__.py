"""Distribution: device mesh, FSDP partition specs, multi-host init."""

from .mesh import make_mesh, shard_batch, shard_params, unshard
from .fsdp import fsdp_partition_spec, partition_params

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_params",
    "unshard",
    "fsdp_partition_spec",
    "partition_params",
]
