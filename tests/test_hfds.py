"""HFDatasetAdapter (README.md:35 HF-datasets support): any indexable
dict-dataset → square or aspect-bucketed training batches. Uses a plain
list of dicts (duck-typed datasets.Dataset) — no `datasets` dependency."""

import numpy as np
import pytest

pytest.importorskip("PIL")

from neurosis_tpu.data.aspect import SDXLBucketList  # noqa: E402
from neurosis_tpu.data.hfds import HFDatasetAdapter  # noqa: E402


def fake_hf_rows(n=6, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    sizes = [(96, 64), (64, 96), (80, 80)]
    rows = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        img = Image.fromarray((rng.rand(h, w, 3) * 255).astype("uint8"))
        rows.append({"image": img, "caption": f"tag_{i}, common tag", "width": w, "height": h})
    return rows


def test_square_mode():
    ds = HFDatasetAdapter(fake_hf_rows(), resolution=32, batch_size=3)
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert "tag 0" in sample["caption"]  # clean_caption maps _ to word_sep
    assert sample["target_size_as_tuple"] == (32, 32)

    batches = list(ds.get_batch_iterator())
    assert len(batches) == 2
    batch = ds.get_batch(batches[0])
    assert batch["image"].shape == (3, 32, 32, 3)


def test_aspect_mode_same_bucket_batches():
    ds = HFDatasetAdapter(fake_hf_rows(12), batch_size=2, buckets=SDXLBucketList())
    for b in ds.get_batch_iterator():
        assert len(b) == 2
        idxs = {int(ds._bucket_idx[i]) for i in b}
        assert len(idxs) == 1, "batch mixes aspect buckets"
        batch = ds.get_batch(b)
        # all images in a same-bucket batch share a shape
        assert batch["image"].ndim == 4


def test_numpy_image_input():
    rows = [{"image": np.random.RandomState(0).rand(48, 64, 3), "caption": "x"}]
    ds = HFDatasetAdapter(rows, resolution=32, batch_size=1)
    assert ds[0]["image"].shape == (32, 32, 3)
