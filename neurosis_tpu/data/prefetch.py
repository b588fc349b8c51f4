"""Background prefetching for the host input pipeline.

The reference leans on torch DataLoader workers (persistent_workers,
imagefolder/aspect.py:256-265); the torch-free equivalent is a thread pool
decoding/augmenting batches ahead of the train step, so S3/PIL latency hides
behind device compute (SURVEY.md §7 hard-part 7).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterable, Iterator, Optional

logger = logging.getLogger(__name__)

_SENTINEL = object()


class PrefetchIterator:
    """Wraps an iterator, materializing up to `buffer_size` items ahead in a
    daemon thread. Exceptions propagate to the consumer."""

    def __init__(self, iterable: Iterable, buffer_size: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, args=(iter(iterable),), daemon=True)
        self._thread.start()

    def _fill(self, it: Iterator):
        try:
            for item in it:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 - reraised on the consumer side
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_batches(
    dataset,
    batch_indices: Iterable[list],
    num_workers: int = 2,
    buffer_size: int = 4,
) -> Iterator[dict]:
    """Decode/collate batches with a thread pool, yielding in order.

    `dataset.get_batch(indices)` runs in workers (PIL decode + crop + collate
    release the GIL for most of their time); results stream back in submission
    order so bucket scheduling is preserved.
    """
    from concurrent.futures import ThreadPoolExecutor

    def gen():
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            pending = []
            it = iter(batch_indices)
            # prime
            for _ in range(buffer_size):
                try:
                    pending.append(pool.submit(dataset.get_batch, next(it)))
                except StopIteration:
                    break
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(dataset.get_batch, next(it)))
                except StopIteration:
                    pass
                yield fut.result()

    return gen()


# ---------------------------------------------------------------------------
# process-based workers (the reference's DataLoader num_workers>0 equivalent,
# imagefolder/aspect.py:256-265): PIL decode does NOT release the GIL for its
# full cost — at production step rates threads starve the device, so decode/
# augment runs in spawned worker processes.
# ---------------------------------------------------------------------------


def _proc_init(env: dict, dataset_blob: bytes):
    """Worker init: force CPU jax BEFORE the dataset module imports anything
    (a child grabbing the TPU would wedge the parent's device tunnel)."""
    import os

    os.environ.update(env)
    import pickle

    global _WORKER_DATASET
    _WORKER_DATASET = pickle.loads(dataset_blob)
    refresh = getattr(_WORKER_DATASET, "_refresh_clients", None)
    if callable(refresh):  # mongo fork-safety contract (base.py:157-175)
        refresh()


def _proc_get_batch(indices):
    return _WORKER_DATASET.get_batch(indices)


def prefetch_batches_processes(
    dataset,
    batch_indices: Iterable[list],
    num_workers: int = 2,
    buffer_size: int = 4,
) -> Iterator[dict]:
    """Decode/collate batches in spawned worker processes, yielding in order.

    The dataset is pickled once per worker (spawn context: no TPU client or
    jit caches leak into children). Falls back to the thread pool if the
    dataset cannot be pickled.
    """
    import pickle

    try:
        blob = pickle.dumps(dataset)
    except Exception:
        logger.warning("dataset not picklable — falling back to thread prefetch")
        return prefetch_batches(dataset, batch_indices, num_workers, buffer_size)

    from concurrent.futures import ProcessPoolExecutor
    from multiprocessing import get_context

    env = {"JAX_PLATFORMS": "cpu", "NEUROSIS_WORKER": "1"}

    def gen():
        with ProcessPoolExecutor(
            max_workers=num_workers,
            mp_context=get_context("spawn"),
            initializer=_proc_init,
            initargs=(env, blob),
        ) as pool:
            pending = []
            it = iter(batch_indices)
            for _ in range(max(buffer_size, num_workers)):
                try:
                    pending.append(pool.submit(_proc_get_batch, next(it)))
                except StopIteration:
                    break
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(_proc_get_batch, next(it)))
                except StopIteration:
                    pass
                yield fut.result()

    return gen()


def make_prefetcher(mode: str = "process"):
    """'process' | 'thread' → the matching prefetch_batches callable."""
    return prefetch_batches_processes if mode == "process" else prefetch_batches
