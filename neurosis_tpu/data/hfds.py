"""HuggingFace-datasets adapter (README.md:35 "Support for Huggingface
datasets (kinda! ... it should work if the keys match)").

Wraps any indexable dataset of dicts — `datasets.Dataset`, a list of dicts,
or anything with `__len__`/`__getitem__` — into the framework's batch
contract: cover-resize + random-crop to a fixed square (or an aspect bucket
when `buckets` is given), SDXL micro-conditioning tuple, caption cleaning,
same-bucket batch schedule. The `datasets` library itself is NOT required;
nothing here imports it.
"""

from __future__ import annotations

from typing import Any, Generator, Optional, Sequence

import numpy as np

from .utils import clean_caption, collate_dict_stack, cropped_sample_fields


def _as_pil(image):
    from PIL import Image

    from .utils import pil_ensure_rgb

    if hasattr(image, "convert"):  # already PIL
        return pil_ensure_rgb(image)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        # dtype-based convention: float arrays are assumed [0,1] (the HF
        # `datasets` float convention); integer arrays are assumed [0,255].
        # A per-image max heuristic would brighten genuinely dark [0,255]
        # floats 255x and make all-equal images value-dependent.
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr * 255.0
        arr = np.clip(arr, 0.0, 255.0).astype(np.uint8)
    return pil_ensure_rgb(Image.fromarray(arr))


class HFDatasetAdapter:
    """dataset[i][image_key/caption_key] → training batches."""

    def __init__(
        self,
        dataset: Any,
        image_key: str = "image",
        caption_key: str = "caption",
        resolution: int = 256,
        batch_size: int = 1,
        buckets: Optional[Any] = None,  # AspectBucketList → aspect mode
        clamp_orig: bool = True,
        process_tags: bool = True,
        shuffle_tags: bool = False,
        shuffle_keep: int = 0,
        tag_sep: str = ", ",
        word_sep: str = " ",
        seed: int = 0,
    ):
        self.dataset = dataset
        self.image_key = image_key
        self.caption_key = caption_key
        self.resolution = (resolution, resolution) if isinstance(resolution, int) else tuple(resolution)
        self.batch_size = batch_size
        self.buckets = buckets
        self.clamp_orig = clamp_orig
        self.process_tags = process_tags
        self.shuffle_tags = shuffle_tags
        self.shuffle_keep = shuffle_keep
        self.tag_sep = tag_sep
        self.word_sep = word_sep
        self.rng = np.random.default_rng(seed)
        self._bucket_idx: Optional[np.ndarray] = None
        if buckets is not None:
            self._assign_buckets()

    def __len__(self) -> int:
        return len(self.dataset)

    # -- aspect mode ---------------------------------------------------------

    def _assign_buckets(self) -> None:
        """One pass over the dataset metadata to pin each row to a bucket.

        Uses `width`/`height` columns when present (HF image datasets usually
        carry them); otherwise opens the image lazily for its size.
        """
        n = len(self.dataset)
        aspects = None
        # column-wise metadata access first (datasets.Dataset supports
        # dataset["width"]): avoids decoding every image just to read sizes
        for cols in (("aspect",), ("width", "height")):
            try:
                vals = [np.asarray(self.dataset[c], dtype=np.float64) for c in cols]
                if all(v.shape == (n,) for v in vals):
                    aspects = vals[0] if len(vals) == 1 else vals[0] / vals[1]
                    break
            except Exception:
                continue
        idxs = np.zeros(n, np.int64)
        for i in range(n):
            if aspects is not None:
                aspect = float(aspects[i])
            else:
                row = self.dataset[i]
                if "aspect" in row:
                    aspect = float(row["aspect"])
                elif "width" in row and "height" in row:
                    aspect = float(row["width"]) / float(row["height"])
                else:
                    im = _as_pil(row[self.image_key])
                    aspect = im.width / im.height
            idxs[i] = int(self.buckets.bucket_idx(aspect))
        self._bucket_idx = idxs

    # -- samples -------------------------------------------------------------

    def __getitem__(self, index: int) -> dict:
        row = self.dataset[index]
        image = _as_pil(row[self.image_key])
        bucket = self.buckets[int(self._bucket_idx[index])] if self.buckets is not None else None
        arr, fields = cropped_sample_fields(
            image, bucket=bucket, resolution=self.resolution, rng=self.rng, clamp_orig=self.clamp_orig
        )
        caption = row.get(self.caption_key, "") if hasattr(row, "get") else row[self.caption_key]
        caption = clean_caption(
            str(caption),
            process_tags=self.process_tags,
            shuffle_tags=self.shuffle_tags,
            shuffle_keep=self.shuffle_keep,
            tag_sep=self.tag_sep,
            word_sep=self.word_sep,
            rng=self.rng,
        )
        return {self.image_key: arr, self.caption_key: caption, **fields}

    # -- batches -------------------------------------------------------------

    def get_batch(self, indices: Sequence[int]) -> dict:
        return collate_dict_stack([self[i] for i in indices])

    def get_batch_iterator(self) -> Generator[list, None, None]:
        if self.buckets is None:
            from .utils import shuffled_chunk_batches

            return shuffled_chunk_batches(len(self.dataset), self.batch_size, self.rng)

        # same-bucket batches (the aspect contract)
        order = np.arange(len(self.dataset), dtype=np.int64)
        self.rng.shuffle(order)
        by_bucket: dict = {}
        for i in order:
            by_bucket.setdefault(int(self._bucket_idx[i]), []).append(int(i))
        sched = []
        for bidx, items in by_bucket.items():
            for b in range(len(items) // self.batch_size):
                sched.append(items[b * self.batch_size : (b + 1) * self.batch_size])
        self.rng.shuffle(sched)
        return iter(sched)
