"""Input-pipeline scaling measurement (VERDICT r2 next #9).

Two curves, printed as JSON:

1. decode scaling 1/2/4 workers on THIS host — on a 1-core box this measures
   the IPC overhead floor, on a multi-core pod host it measures real scaling;
2. latency-hiding: a sleep-injected dataset (S3 GET simulation, 150 ms/batch)
   through the process prefetcher — latency-bound work scales with workers
   even on one core, which is the property that hides S3 round-trips.

Run: python tools/pipeline_scaling.py  (CPU only, ~2 min)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SleepyDataset:
    """Simulates a remote-blob dataset: each get_batch pays a fixed IO latency
    (fsspec S3 GET round trip) plus a small decode cost."""

    def __init__(self, latency_s: float = 0.15, batch: int = 8):
        self.latency_s = latency_s
        self.batch = batch

    def get_batch(self, indices):
        time.sleep(self.latency_s)
        rng = np.random.RandomState(indices[0] if indices else 0)
        return {"image": rng.rand(self.batch, 64, 64, 3).astype(np.float32)}


def decode_curve(workers_list=(1, 2, 4), n_images: int = 48, batch: int = 8) -> dict:
    from PIL import Image

    from neurosis_tpu.data.aspect import SDXLBucketList
    from neurosis_tpu.data.imagefolder import ImageFolderDataset
    from neurosis_tpu.data.prefetch import prefetch_batches_processes

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        rng = np.random.RandomState(0)
        sizes = [(1280, 960), (1024, 1024), (896, 1152)]
        for i in range(n_images):
            w, h = sizes[i % len(sizes)]
            Image.fromarray((rng.rand(h, w, 3) * 255).astype("uint8")).save(
                f"{tmp}/img_{i:04d}.jpg", quality=90
            )
            open(f"{tmp}/img_{i:04d}.txt", "w").write("bench image")
        ds = ImageFolderDataset(folder=tmp, buckets=SDXLBucketList(), batch_size=batch)
        idx = list(ds.get_batch_iterator())

        # single-process baseline (the per-worker unit)
        t0 = time.perf_counter()
        n = sum(ds.get_batch(i)["image"].shape[0] for i in idx)
        out["direct"] = round(n / (time.perf_counter() - t0), 2)

        for w in workers_list:
            out[f"workers_{w}"] = round(
                _timed_rate(
                    prefetch_batches_processes(ds, iter(idx * 2), num_workers=w),
                    warm=2 * w,
                    count=lambda b: b["image"].shape[0],
                ),
                2,
            )
    return out


def _timed_rate(iterator, warm: int, count) -> float:
    """Steady-state rate: clock starts after `warm` yields (pool spawn is a
    one-time cost amortized over an epoch in real training)."""
    n, start = 0, None
    for i, b in enumerate(iterator):
        if i < warm:
            continue
        if start is None:
            start = time.perf_counter()
        n += count(b)
    # n items observed but the first's production time precedes the clock
    return (n - count(b)) / (time.perf_counter() - start)


def latency_curve(workers_list=(1, 2, 4), n_batches: int = 24, latency_s: float = 0.15) -> dict:
    from neurosis_tpu.data.prefetch import prefetch_batches_processes

    ds = SleepyDataset(latency_s=latency_s)
    out = {"io_bound_batches_per_sec_ceiling_1w": round(1.0 / latency_s, 2)}
    for w in workers_list:
        idx = [[i] for i in range(n_batches + 2 * w)]
        out[f"workers_{w}"] = round(
            _timed_rate(
                prefetch_batches_processes(ds, iter(idx), num_workers=w),
                warm=2 * w,
                count=lambda b: 1,
            ),
            2,
        )
    return out


if __name__ == "__main__":
    result = {
        "host_cores": os.cpu_count(),
        "decode_imgs_per_sec": decode_curve(),
        "latency_hiding_batches_per_sec": latency_curve(),
    }
    print(json.dumps(result, indent=2))
