"""Sharded bucket-batch sampling.

Parity: dataset/aspect/sampler.py:15-87 — AspectBucketSampler wraps the
dataset's batch iterator; AspectDistributedSampler shards the PRE-BUILT batch
list across replicas with the `indices[rank::num_replicas]` stride, pad-to-
divisible, and epoch-seeded deterministic shuffle.

In the TPU design each host runs one sampler instance with
(rank=process_index, num_replicas=process_count); per-chip sharding within the
host happens at device_put time (parallel/mesh.py).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence

import numpy as np


class AspectBucketSampler:
    """Single-replica: just the dataset's same-bucket batch schedule."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __iter__(self) -> Iterator[list[int]]:
        return iter(self.dataset.get_batch_iterator())


class ShardedBatchSampler:
    """Rank-strided sharding of a list of pre-built batches (sampler.py:27-87)."""

    def __init__(
        self,
        batches: Sequence[list[int]],
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        if rank >= num_replicas or rank < 0:
            raise ValueError(f"invalid rank {rank} for {num_replicas} replicas")
        self.batches = list(batches)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        n = len(self.batches)
        if self.drop_last and n % num_replicas:
            self.num_samples = math.ceil((n - num_replicas) / num_replicas)
        else:
            self.num_samples = math.ceil(n / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[list[int]]:
        n = len(self.batches)
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            order = g.permutation(n).tolist()
        else:
            order = list(range(n))

        if not self.drop_last:
            padding = self.total_size - len(order)
            if padding <= len(order):
                order += order[:padding]
            else:
                order += (order * math.ceil(padding / len(order)))[:padding]
        else:
            order = order[: self.total_size]
        assert len(order) == self.total_size

        order = order[self.rank : self.total_size : self.num_replicas]
        assert len(order) == self.num_samples
        return iter(self.batches[i] for i in order)


def shard_batches_for_host(
    dataset,
    num_replicas: Optional[int] = None,
    rank: Optional[int] = None,
    shuffle: bool = True,
    seed: int = 0,
) -> ShardedBatchSampler:
    """Build the per-host sampler from jax process topology."""
    import jax

    num_replicas = num_replicas if num_replicas is not None else jax.process_count()
    rank = rank if rank is not None else jax.process_index()
    batches = list(dataset.get_batch_iterator())
    return ShardedBatchSampler(batches, num_replicas=num_replicas, rank=rank, shuffle=shuffle, seed=seed)
