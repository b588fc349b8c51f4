"""Data pipeline: aspect buckets, datasets, collate, caption processing."""

from .aspect import (
    AspectBucket,
    AspectBucketList,
    SDXLBucketList,
    WDXLBucketList,
    WDXLBucketList2,
)

__all__ = [
    "AspectBucket",
    "AspectBucketList",
    "SDXLBucketList",
    "WDXLBucketList",
    "WDXLBucketList2",
]
