"""Mongo + S3 streaming dataset (parity: dataset/mongo/{base,settings,aspect}.py).

Architecture preserved from the reference:
  - pydantic MongoSettings with `mongo_` env prefix + Query model
    (settings.py:20-138);
  - metadata pulled once (pymongoarrow when present, plain pymongo cursor
    fallback) and cached as a zstd-pickled DataFrame keyed by query hash
    (base.py:114-202);
  - fork-aware client refresh (pid tracking — workers re-open Mongo/S3
    handles, base.py:157-175);
  - retrying fsspec `cat` image fetch with backoff (base.py:234-262);
  - aspect-bucket assignment + same-bucket batch iterator (aspect.py:161-232).

pymongo / s3fs are LAZY imports (absent in this image): constructing the
dataset raises a clear error unless the deps are installed, but the module
always imports.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import time
from pathlib import Path
from typing import Any, Generator, Optional, Sequence

import numpy as np
from pydantic import BaseModel, Field

logger = logging.getLogger(__name__)


class Query(BaseModel):
    """Mongo find() spec (settings.py Query)."""

    filter: dict = Field(default_factory=dict)
    projection: Optional[dict] = None
    sort: Optional[list] = None
    limit: int = 0


class MongoSettings(BaseModel):
    """Connection settings; `mongo_` env vars override (settings.py:42-138)."""

    uri: str = "mongodb://localhost:27017"
    database: str = "dataset"
    collection: str = "images"
    query: Query = Field(default_factory=Query)
    tls: bool = False

    @classmethod
    def from_env(cls, **overrides) -> "MongoSettings":
        env = {
            k[len("mongo_") :]: v for k, v in os.environ.items() if k.lower().startswith("mongo_")
        }
        env.update(overrides)
        known = set(cls.model_fields)
        return cls(**{k: v for k, v in env.items() if k in known})

    def query_hash(self) -> str:
        payload = repr((self.uri, self.database, self.collection, self.query.model_dump()))
        return hashlib.sha1(payload.encode()).hexdigest()


class BaseMongoDataset:
    """Metadata-cached, fork-safe, retrying Mongo+S3 sample source."""

    def __init__(
        self,
        settings: Optional[MongoSettings] = None,
        image_url_key: str = "s3_url",
        cache_dir: Optional[str] = None,
        retries: int = 5,
        retry_backoff: float = 1.5,
        s3_endpoint: Optional[str] = None,
        skip_preload: bool = False,
        extra_keys: Sequence[str] | str = (),
        fs_type: str = "s3",  # FilesystemType: any fsspec protocol (s3|file|http|...)
        fsspec_kwargs: Optional[dict] = None,
        path_prefix: Optional[str] = None,
        data_transforms: Sequence[Any] = (),  # DataTransform chain (base.py:229-232)
    ):
        self.settings = settings or MongoSettings.from_env()
        self.image_url_key = image_url_key
        self.cache_dir = Path(cache_dir or os.environ.get("NEUROSIS_CACHE", "/tmp/neurosis_cache"))
        self.retries = retries
        self.retry_backoff = retry_backoff
        self.s3_endpoint = s3_endpoint or os.environ.get("S3_ENDPOINT_URL")
        self.extra_keys = extra_keys
        self.fs_type = str(fs_type)
        self.fsspec_kwargs = dict(fsspec_kwargs or {})
        self.path_prefix = path_prefix
        self.data_transforms = list(data_transforms)
        self._client = None
        self._fs = None
        self._pid = os.getpid()
        self.samples = None
        if not skip_preload:
            self.preload()

    # -- fork safety (base.py:157-175) --------------------------------------

    def _refresh_clients(self) -> None:
        if os.getpid() != self._pid:
            logger.debug("fork detected — resetting mongo/s3 clients")
            self._client = None
            self._fs = None
            self._pid = os.getpid()

    @property
    def client(self):
        self._refresh_clients()
        if self._client is None:
            try:
                import pymongo
            except ImportError as e:
                raise ImportError("MongoDataset requires pymongo (pip install pymongo)") from e
            self._client = pymongo.MongoClient(self.settings.uri, tls=self.settings.tls)
        return self._client

    @property
    def fs(self):
        self._refresh_clients()
        if self._fs is None:
            import fsspec

            kwargs = dict(self.fsspec_kwargs)
            if self.fs_type == "s3" and self.s3_endpoint:
                kwargs.setdefault("client_kwargs", {"endpoint_url": self.s3_endpoint})
            self._fs = fsspec.filesystem(self.fs_type, **kwargs)
        return self._fs

    # -- metadata (base.py:114-217) ------------------------------------------

    def _cache_path(self) -> Path:
        node = os.environ.get("HOSTNAME", "local")
        return self.cache_dir / f"meta_{self.settings.query_hash()}_{node}.pkl.zst"

    def preload(self, force: bool = False):
        import pandas as pd

        cache = self._cache_path()
        if cache.exists() and not force:
            import zstandard

            with open(cache, "rb") as f:
                self.samples = pickle.loads(zstandard.ZstdDecompressor().decompress(f.read()))
            logger.info(f"loaded {len(self.samples)} rows from metadata cache {cache}")
            return self.samples

        coll = self.client[self.settings.database][self.settings.collection]
        q = self.settings.query
        try:
            from pymongoarrow.api import find_pandas_all

            df = find_pandas_all(coll, q.filter, projection=q.projection)
        except ImportError:
            cursor = coll.find(q.filter, q.projection)
            if q.sort:
                cursor = cursor.sort(q.sort)
            if q.limit:
                cursor = cursor.limit(q.limit)
            df = pd.DataFrame(list(cursor))
        self.samples = df

        import zstandard

        cache.parent.mkdir(parents=True, exist_ok=True)
        with open(cache, "wb") as f:
            f.write(zstandard.ZstdCompressor(level=3).compress(pickle.dumps(df)))
        logger.info(f"pulled {len(df)} rows; cached to {cache}")
        return df

    # -- image fetch (base.py:234-262) ----------------------------------------

    def _get_image_bytes(self, url: str) -> bytes:
        if self.path_prefix:
            url = self.path_prefix.rstrip("/") + "/" + str(url).lstrip("/")
        delay = 0.5
        last = None
        for attempt in range(self.retries):
            try:
                return self.fs.cat(url)
            except Exception as e:  # noqa: BLE001 — network retry loop
                last = e
                logger.warning(f"fetch {url} failed (attempt {attempt + 1}/{self.retries}): {e}")
                time.sleep(delay)
                delay *= self.retry_backoff
        raise RuntimeError(f"failed to fetch {url} after {self.retries} attempts") from last

    def _apply_transforms(self, sample: dict, row) -> dict:
        """Injected DataTransform chain (base.py:229-232): each transform sees
        the sample dict plus the raw metadata row."""
        for tfm in self.data_transforms:
            sample = tfm(sample, dict(row) if hasattr(row, "keys") else row)
        return sample

    def _load_image(self, url: str):
        import io

        from PIL import Image

        from .utils import pil_ensure_rgb

        return pil_ensure_rgb(Image.open(io.BytesIO(self._get_image_bytes(url))))

    def __len__(self) -> int:
        return 0 if self.samples is None else len(self.samples)


class MongoAspectDataset(BaseMongoDataset):
    """Mongo base × aspect buckets (aspect.py:38-232)."""

    def __init__(
        self,
        buckets=None,
        batch_size: int = 1,
        image_key: str = "image",
        caption_key: str = "caption",
        resolution_key: str = "resolution",
        aspect_key: str = "aspect",
        clamp_orig: bool = True,
        seed: int = 0,
        **kwargs,
    ):
        from .aspect import SDXLBucketList

        self.buckets = buckets if buckets is not None else SDXLBucketList()
        self.batch_size = batch_size
        self.image_key = image_key
        self.caption_key = caption_key
        self.resolution_key = resolution_key
        self.aspect_key = aspect_key
        self.clamp_orig = clamp_orig
        self.rng = np.random.default_rng(seed)
        super().__init__(**kwargs)

    def preload(self, force: bool = False):
        df = super().preload(force)
        if df is not None and len(df) and "bucket_idx" not in df.columns:
            aspects = df[self.aspect_key].astype(float)
            df["bucket_idx"] = [int(self.buckets.bucket_idx(a)) for a in aspects]
        return df

    def __getitem__(self, index: int) -> dict:
        from .utils import cropped_sample_fields

        row = self.samples.iloc[index]
        bucket = self.buckets[int(row.bucket_idx)]
        image = self._load_image(row[self.image_url_key])
        arr, fields = cropped_sample_fields(image, bucket=bucket, rng=self.rng, clamp_orig=self.clamp_orig)
        sample = {self.image_key: arr, self.caption_key: str(row[self.caption_key]), **fields}
        return self._apply_transforms(sample, row)

    def get_batch(self, indices: Sequence[int]) -> dict:
        from .utils import collate_dict_stack

        return collate_dict_stack([self[i] for i in indices])

    def get_batch_iterator(self) -> Generator[list[int], None, None]:
        """Same-bucket batch schedule (aspect.py:200-232)."""
        groups = self.samples.groupby("bucket_idx")
        max_len = groups.size().max()
        index_sched = np.arange(max_len, dtype=np.int64)
        self.rng.shuffle(index_sched)

        bucket_dict = {
            idx: (frame.index.values, len(frame), 0)
            for idx, frame in groups
            if len(frame) >= self.batch_size
        }
        bucket_sched = []
        for idx, (indices, _, _) in bucket_dict.items():
            bucket_sched.extend([idx] * (len(indices) // self.batch_size))
        self.rng.shuffle(bucket_sched)

        def it():
            buckets = dict(bucket_dict)
            for idx in bucket_sched:
                indices, b_len, b_offs = buckets[idx]
                batch = []
                while len(batch) < self.batch_size:
                    k = index_sched[b_offs]
                    if k < b_len:
                        batch.append(int(indices[k]))
                    b_offs += 1
                buckets[idx] = (indices, b_len, b_offs)
                yield batch

        return it()


class MongoSquareDataset(BaseMongoDataset):
    """Fixed-square mongo dataset (mongo/nobucket.py:22-143): cover-resize +
    random-crop every sample to `resolution`, captions + SDXL micro-conds."""

    def __init__(
        self,
        resolution: int = 256,
        batch_size: int = 1,
        image_key: str = "image",
        caption_key: str = "caption",
        clamp_orig: bool = True,
        seed: int = 0,
        **kwargs,
    ):
        self.resolution = (resolution, resolution) if isinstance(resolution, int) else tuple(resolution)
        self.batch_size = batch_size
        self.image_key = image_key
        self.caption_key = caption_key
        self.clamp_orig = clamp_orig
        self.rng = np.random.default_rng(seed)
        super().__init__(**kwargs)

    def __getitem__(self, index: int) -> dict:
        from .utils import cropped_sample_fields

        row = self.samples.iloc[index]
        image = self._load_image(row[self.image_url_key])
        arr, fields = cropped_sample_fields(
            image, resolution=self.resolution, rng=self.rng, clamp_orig=self.clamp_orig
        )
        sample = {self.image_key: arr, **fields}
        if self.caption_key is not None:
            sample[self.caption_key] = str(row[self.caption_key])
        return self._apply_transforms(sample, row)

    def get_batch(self, indices: Sequence[int]) -> dict:
        from .utils import collate_dict_stack

        return collate_dict_stack([self[i] for i in indices])

    def get_batch_iterator(self) -> Generator[list[int], None, None]:
        """No buckets: shuffled fixed-size chunks (nobucket.py contract)."""
        from .utils import shuffled_chunk_batches

        return shuffled_chunk_batches(len(self.samples), self.batch_size, self.rng)


class MongoVAEDataset(MongoSquareDataset):
    """Square mongo dataset without captions (mongo/nocaption.py:21-104) —
    VAE training needs images only."""

    def __init__(self, **kwargs):
        kwargs.setdefault("caption_key", None)
        super().__init__(**kwargs)


class S3ImageLoader:
    """Standalone parallel S3 image fetcher (dataset/loaders.py:22-148)."""

    def __init__(self, s3_endpoint: Optional[str] = None, max_workers: int = 16, retries: int = 5):
        self.s3_endpoint = s3_endpoint or os.environ.get("S3_ENDPOINT_URL")
        self.max_workers = max_workers
        self.retries = retries
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            import fsspec

            kwargs = {}
            if self.s3_endpoint:
                kwargs["client_kwargs"] = {"endpoint_url": self.s3_endpoint}
            self._fs = fsspec.filesystem("s3", **kwargs)
        return self._fs

    def fetch(self, urls: Sequence[str]) -> dict[str, bytes]:
        """Parallel multi-get; failed URLs dropped with a warning."""
        try:
            result = self.fs.cat(list(urls), on_error="omit")
        except Exception:
            result = {}
            from concurrent.futures import ThreadPoolExecutor

            def one(u):
                try:
                    return u, self.fs.cat(u)
                except Exception as e:  # noqa: BLE001
                    logger.warning(f"drop {u}: {e}")
                    return u, None

            with ThreadPoolExecutor(self.max_workers) as ex:
                for u, b in ex.map(one, urls):
                    if b is not None:
                        result[u] = b
        return result
