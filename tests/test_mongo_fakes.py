"""Mongo+S3 streaming dataset with injected fakes (no pymongo/s3fs needed).

Covers the failure-handling machinery the reference evolved in
dataset/mongo/base.py:114-262: metadata cache miss→pull→cache hit, fork-aware
client refresh (pid tracking), retry-with-backoff image fetch, aspect-bucket
assignment, and the same-bucket batch iterator — all with fake Mongo
collections and fake fsspec filesystems.
"""

import io
import os

import numpy as np
import pytest

from neurosis_tpu.data.mongo import (
    BaseMongoDataset,
    MongoAspectDataset,
    MongoSettings,
    Query,
    S3ImageLoader,
)


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------


class FakeCursor:
    def __init__(self, rows):
        self.rows = list(rows)

    def sort(self, spec):
        return self

    def limit(self, n):
        self.rows = self.rows[:n]
        return self

    def __iter__(self):
        return iter(self.rows)


class FakeCollection:
    def __init__(self, rows):
        self.rows = rows
        self.find_calls = 0

    def find(self, filter=None, projection=None):
        self.find_calls += 1
        return FakeCursor(self.rows)


class FakeDB:
    def __init__(self, coll):
        self.coll = coll

    def __getitem__(self, name):
        return self.coll


class FakeClient:
    """client[database][collection] → FakeCollection, name-agnostic."""

    def __init__(self, rows):
        self.coll = FakeCollection(rows)

    def __getitem__(self, name):
        return FakeDB(self.coll)


def _png_bytes(w=96, h=64, seed=0):
    from PIL import Image

    arr = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class FakeFS:
    """fsspec stand-in: url → bytes, with scripted failures per url."""

    def __init__(self, blobs, fail_first=0):
        self.blobs = dict(blobs)
        self.fail_first = fail_first
        self.calls = {}

    def cat(self, url, on_error=None):
        if isinstance(url, list):
            out = {}
            for u in url:
                try:
                    out[u] = self.cat(u)
                except KeyError:
                    if on_error != "omit":
                        raise
            return out
        self.calls[url] = self.calls.get(url, 0) + 1
        if self.calls[url] <= self.fail_first:
            raise ConnectionError(f"scripted failure {self.calls[url]} for {url}")
        return self.blobs[url]


def rows(n=8):
    rng = np.random.RandomState(0)
    return [
        {
            "s3_url": f"s3://bucket/img{i}.png",
            "caption": f"caption {i}",
            "aspect": float(rng.choice([1.0, 1.5, 0.66])),
            "resolution": [96, 64],
        }
        for i in range(n)
    ]


def make_ds(tmp_path, cls=BaseMongoDataset, n=8, **kwargs):
    ds = cls(
        settings=MongoSettings(uri="mongodb://fake", database="db", collection="images"),
        cache_dir=str(tmp_path / "cache"),
        skip_preload=True,
        retries=3,
        retry_backoff=1.0,
        **kwargs,
    )
    ds._client = FakeClient(rows(n))
    return ds


# ---------------------------------------------------------------------------
# metadata cache (base.py:114-202)
# ---------------------------------------------------------------------------


def test_metadata_pull_then_cache_hit(tmp_path):
    ds = make_ds(tmp_path)
    df = ds.preload()
    assert len(df) == 8 and ds._client.coll.find_calls == 1
    assert ds._cache_path().exists()

    # second dataset with the same query: cache hit, NO client access
    ds2 = make_ds(tmp_path)
    ds2._client = None  # any client use would crash
    df2 = ds2.preload()
    assert len(df2) == 8
    assert list(df2["caption"]) == list(df["caption"])


def test_cache_keyed_by_query_hash(tmp_path):
    a = MongoSettings(uri="u", database="d", collection="c", query=Query(filter={"x": 1}))
    b = MongoSettings(uri="u", database="d", collection="c", query=Query(filter={"x": 2}))
    assert a.query_hash() != b.query_hash()

    ds = make_ds(tmp_path)
    ds.settings = a
    ds.preload()
    ds2 = make_ds(tmp_path)
    ds2.settings = b
    # different hash => cache miss => fresh pull from its own client
    ds2.preload()
    assert ds2._client.coll.find_calls == 1


def test_preload_force_repulls(tmp_path):
    ds = make_ds(tmp_path)
    ds.preload()
    ds.preload(force=True)
    assert ds._client.coll.find_calls == 2


# ---------------------------------------------------------------------------
# fork safety (base.py:157-175)
# ---------------------------------------------------------------------------


def test_fork_detection_resets_clients(tmp_path):
    ds = make_ds(tmp_path)
    ds._fs = FakeFS({})
    assert ds._client is not None and ds._fs is not None

    ds._pid = os.getpid() - 1  # simulate being in a forked child
    ds._refresh_clients()
    assert ds._client is None and ds._fs is None
    assert ds._pid == os.getpid()


def test_same_pid_keeps_clients(tmp_path):
    ds = make_ds(tmp_path)
    client = ds._client
    ds._refresh_clients()
    assert ds._client is client


# ---------------------------------------------------------------------------
# retrying fetch (base.py:234-262)
# ---------------------------------------------------------------------------


def test_fetch_retries_then_succeeds(tmp_path, monkeypatch):
    monkeypatch.setattr("neurosis_tpu.data.mongo.time.sleep", lambda s: None)
    ds = make_ds(tmp_path)
    blob = _png_bytes()
    ds._fs = FakeFS({"s3://bucket/img0.png": blob}, fail_first=2)
    assert ds._get_image_bytes("s3://bucket/img0.png") == blob
    assert ds._fs.calls["s3://bucket/img0.png"] == 3


def test_fetch_exhausts_retries(tmp_path, monkeypatch):
    monkeypatch.setattr("neurosis_tpu.data.mongo.time.sleep", lambda s: None)
    ds = make_ds(tmp_path)
    ds._fs = FakeFS({}, fail_first=99)
    ds._fs.blobs["s3://x"] = b""
    with pytest.raises(RuntimeError, match="failed to fetch"):
        ds._get_image_bytes("s3://x")
    assert ds._fs.calls["s3://x"] == 3  # retries=3


# ---------------------------------------------------------------------------
# aspect dataset end-to-end (aspect.py:38-232)
# ---------------------------------------------------------------------------


def test_aspect_dataset_getitem_and_batches(tmp_path):
    ds = make_ds(tmp_path, cls=MongoAspectDataset, n=8, batch_size=2)
    ds._fs = FakeFS({f"s3://bucket/img{i}.png": _png_bytes(seed=i) for i in range(8)})
    ds.preload()
    assert "bucket_idx" in ds.samples.columns

    sample = ds[0]
    bucket = ds.buckets[int(ds.samples.iloc[0].bucket_idx)]
    assert sample["image"].shape == (bucket.height, bucket.width, 3)
    assert sample["caption"] == "caption 0"
    assert len(sample["crop_coords_top_left"]) == 2
    # clamp_orig: original size never exceeds the bucket (SDXL microcond contract)
    assert sample["original_size_as_tuple"][0] <= bucket.width

    batches = list(ds.get_batch_iterator())
    assert batches, "no batches scheduled"
    for b in batches:
        assert len(b) == 2
        # same-bucket constraint
        idxs = ds.samples.iloc[b]["bucket_idx"]
        assert idxs.nunique() == 1

    batch = ds.get_batch(batches[0])
    assert batch["image"].shape[0] == 2
    assert batch["image"].dtype == np.float32


# ---------------------------------------------------------------------------
# S3ImageLoader (dataset/loaders.py:22-148)
# ---------------------------------------------------------------------------


def test_s3_loader_drops_failed_urls():
    loader = S3ImageLoader(max_workers=2, retries=1)
    loader._fs = FakeFS({"s3://a": b"A", "s3://b": b"B"})
    out = loader.fetch(["s3://a", "s3://b", "s3://missing"])
    assert out == {"s3://a": b"A", "s3://b": b"B"}


# ---------------------------------------------------------------------------
# square / VAE variants (mongo/nobucket.py:22-143, nocaption.py:21-104)
# ---------------------------------------------------------------------------


def test_mongo_square_dataset(tmp_path):
    from neurosis_tpu.data.mongo import MongoSquareDataset

    ds = make_ds(tmp_path, cls=MongoSquareDataset, n=6, batch_size=3, resolution=32)
    ds._fs = FakeFS({f"s3://bucket/img{i}.png": _png_bytes(seed=i) for i in range(6)})
    ds.preload()

    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["caption"] == "caption 0"
    assert sample["target_size_as_tuple"] == (32, 32)
    # clamp_orig: original size clamped to the crop resolution
    assert sample["original_size_as_tuple"] == (32, 32)

    batches = list(ds.get_batch_iterator())
    assert len(batches) == 2 and all(len(b) == 3 for b in batches)
    batch = ds.get_batch(batches[0])
    assert batch["image"].shape == (3, 32, 32, 3)
    assert len(batch["caption"]) == 3


def test_mongo_vae_dataset_has_no_captions(tmp_path):
    from neurosis_tpu.data.mongo import MongoVAEDataset

    ds = make_ds(tmp_path, cls=MongoVAEDataset, n=4, batch_size=2, resolution=32)
    ds._fs = FakeFS({f"s3://bucket/img{i}.png": _png_bytes(seed=i) for i in range(4)})
    ds.preload()
    sample = ds[0]
    assert "caption" not in sample
    assert sample["image"].shape == (32, 32, 3)


def test_local_filesystem_and_path_prefix(tmp_path):
    """fs_type='file' + path_prefix (base.py FilesystemType + path_prefix):
    the dataset reads images off the local disk through fsspec."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        arr = (np.random.RandomState(i).rand(64, 96, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(img_dir / f"img{i}.png")

    rows_local = [
        {"s3_url": f"img{i}.png", "caption": f"c{i}", "aspect": 1.5, "resolution": [96, 64]}
        for i in range(3)
    ]
    from neurosis_tpu.data.mongo import MongoSquareDataset

    ds = MongoSquareDataset(
        settings=MongoSettings(uri="mongodb://fake", database="db", collection="images"),
        cache_dir=str(tmp_path / "cache"),
        skip_preload=True,
        resolution=32,
        fs_type="file",
        path_prefix=str(img_dir),
    )
    ds._client = FakeClient(rows_local)
    ds.preload()
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)


def test_data_transform_chain(tmp_path):
    """Injected DataTransform chain (base.py:229-232 + processing/transform.py):
    transforms see the sample dict and the raw metadata row."""
    from neurosis_tpu.data.mongo import MongoSquareDataset
    from neurosis_tpu.data.processing import DataTransform

    class AddSourceTag(DataTransform):
        def __init__(self):
            super().__init__("source_tag", ["caption"])

        def __call__(self, sample, raw=None):
            sample = dict(sample)
            sample["caption"] = sample["caption"] + f", src:{raw['s3_url'].split('/')[-1]}"
            return sample

    class Brighten(DataTransform):
        def __init__(self):
            super().__init__("brighten", ["image"])

        def __call__(self, sample, raw=None):
            sample = dict(sample)
            sample["image"] = np.clip(sample["image"] + 0.1, -1.0, 1.0)
            return sample

    ds = make_ds(
        tmp_path, cls=MongoSquareDataset, n=2, batch_size=2, resolution=32,
        data_transforms=[AddSourceTag(), Brighten()],
    )
    ds._fs = FakeFS({f"s3://bucket/img{i}.png": _png_bytes(seed=i) for i in range(2)})
    ds.preload()
    sample = ds[0]
    assert sample["caption"].endswith("src:img0.png")
    assert float(sample["image"].max()) <= 1.0
