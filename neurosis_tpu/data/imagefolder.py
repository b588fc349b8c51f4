"""ImageFolder datasets: aspect-bucketed and square variants.

Parity: dataset/imagefolder/aspect.py:26-191 (ImageFolderDataset),
nobucket.py:19-123 (FolderSquareDataset), nocaption.py:19-78 (FolderVAEDataset).

Torch-free: samples come back as numpy NHWC float32 [-1,1]; batching is driven
by `get_batch_iterator` (same-bucket batches = stable XLA shapes) and the
sharded sampler in data/sampler.py.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Generator, Optional, Sequence

import numpy as np
import pandas as pd

from .aspect import AspectBucket, AspectBucketList, SDXLBucketList
from .utils import clean_caption, collate_dict_stack, image_to_array, load_bucket_image_file, load_crop_image_file

logger = logging.getLogger(__name__)

IMAGE_EXTNS = {".png", ".jpg", ".jpeg", ".webp", ".bmp", ".gif", ".tiff"}


class ImageFolderDataset:
    """Folder of images + sidecar caption files, bucketed by aspect."""

    def __init__(
        self,
        folder,
        buckets: Optional[AspectBucketList] = None,
        batch_size: int = 1,
        image_key: str = "image",
        caption_key: str = "caption",
        caption_ext: str = ".txt",
        tag_sep: str = ", ",
        word_sep: str = " ",
        recursive: bool = False,
        clamp_orig: bool = True,
        process_tags: bool = True,
        shuffle_tags: bool = True,
        shuffle_keep: int = 0,
        seed: int = 0,
        image_dtype: str = "float32",  # "uint8": int8 input path (ops/dequant.py)
    ):
        self.folder = Path(folder).resolve()
        if not self.folder.is_dir():
            raise FileNotFoundError(f"Folder {self.folder} does not exist or is not a directory.")
        self.buckets = buckets if buckets is not None else SDXLBucketList()
        self.batch_size = batch_size
        self.image_key = image_key
        self.caption_key = caption_key
        self.caption_ext = caption_ext
        self.tag_sep = tag_sep
        self.word_sep = word_sep
        self.recursive = recursive
        self.clamp_orig = clamp_orig
        self.process_tags = process_tags
        self.shuffle_tags = shuffle_tags
        self.shuffle_keep = shuffle_keep
        self.image_dtype = image_dtype
        self.rng = np.random.default_rng(seed)
        self.preload()

    # -- metadata ----------------------------------------------------------

    def preload(self):
        file_iter = self.folder.rglob("**/*.*") if self.recursive else self.folder.glob("*.*")
        image_files = [x for x in file_iter if x.is_file() and x.suffix.lower() in IMAGE_EXTNS]
        if not image_files:
            raise FileNotFoundError(f"no images in {self.folder}")
        rows = [self._load_meta(p) for p in sorted(image_files)]
        self.samples = pd.DataFrame(rows)

        # merge undersized portrait buckets into the next one (aspect.py:111-118)
        counts = self.samples.groupby("bucket_idx").size()
        for bucket_id, n in counts.items():
            if n >= self.batch_size:
                continue
            if self.buckets[int(bucket_id)].aspect < 1.0:
                sel = self.samples.bucket_idx == bucket_id
                self.samples.loc[sel, "bucket_idx"] = int(bucket_id) + 1

    def _load_meta(self, image_path: Path) -> dict:
        from PIL import Image

        caption_file = image_path.with_suffix(self.caption_ext)
        if not caption_file.exists():
            raise FileNotFoundError(f"Caption {self.caption_ext} for image {image_path} does not exist.")
        caption = caption_file.read_text(encoding="utf-8")
        with Image.open(image_path) as im:
            resolution = np.asarray(im.size, np.int32)
        aspect = float(resolution[0]) / float(resolution[1])
        return dict(
            image_path=str(image_path),
            caption=caption,
            aspect=np.float32(aspect),
            resolution=resolution,
            bucket_idx=np.int32(self.buckets.bucket_idx(aspect)),
        )

    # -- items -------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        sample = self.samples.iloc[index]
        bucket: AspectBucket = self.buckets[int(sample.bucket_idx)]
        image, crop = load_bucket_image_file(sample.image_path, bucket, rng=self.rng)
        caption = clean_caption(
            sample.caption,
            process_tags=self.process_tags,
            shuffle_tags=self.shuffle_tags,
            shuffle_keep=self.shuffle_keep,
            tag_sep=self.tag_sep,
            word_sep=self.word_sep,
            rng=self.rng,
        )
        return {
            self.image_key: image_to_array(image, getattr(self, 'image_dtype', 'float32')),
            self.caption_key: caption,
            "original_size_as_tuple": self._get_osize(tuple(sample.resolution), bucket),
            "crop_coords_top_left": crop,
            "target_size_as_tuple": bucket.size,
        }

    def get_batch(self, indices: Sequence[int]) -> dict:
        return collate_dict_stack([self[i] for i in indices])

    def _get_osize(self, resolution, bucket: AspectBucket):
        if not self.clamp_orig:
            return tuple(int(x) for x in resolution)
        return (min(int(resolution[0]), bucket.width), min(int(resolution[1]), bucket.height))

    # -- batch schedule (aspect.py:160-191) --------------------------------

    def get_batch_iterator(self) -> Generator[list[int], None, None]:
        max_bucket_len = self.samples.groupby("bucket_idx").size().max()
        index_sched = np.arange(max_bucket_len, dtype=np.int64)
        self.rng.shuffle(index_sched)

        bucket_dict = {
            idx: (frame.index.values, len(frame), 0)
            for idx, frame in self.samples.groupby("bucket_idx")
            if len(frame) >= self.batch_size
        }

        bucket_sched = []
        for idx, (indices, _, _) in bucket_dict.items():
            bucket_sched.extend([idx] * (len(indices) // self.batch_size))
        self.rng.shuffle(bucket_sched)

        def batch_iterator():
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

        return batch_iterator()


class FolderSquareDataset:
    """Square-resize variant with captions (nobucket.py:19-123)."""

    def __init__(
        self,
        folder,
        resolution: int = 256,
        batch_size: int = 1,
        image_key: str = "image",
        caption_key: str = "caption",
        caption_ext: str = ".txt",
        recursive: bool = False,
        process_tags: bool = True,
        shuffle_tags: bool = False,
        shuffle_keep: int = 0,
        tag_sep: str = ", ",
        word_sep: str = " ",
        seed: int = 0,
        image_dtype: str = "float32",  # "uint8": int8 input path (ops/dequant.py)
    ):
        self.folder = Path(folder).resolve()
        self.resolution = resolution
        self.image_dtype = image_dtype
        self.batch_size = batch_size
        self.image_key = image_key
        self.caption_key = caption_key
        self.caption_ext = caption_ext
        self.process_tags = process_tags
        self.shuffle_tags = shuffle_tags
        self.shuffle_keep = shuffle_keep
        self.tag_sep = tag_sep
        self.word_sep = word_sep
        self.rng = np.random.default_rng(seed)
        file_iter = self.folder.rglob("**/*.*") if recursive else self.folder.glob("*.*")
        self.paths = sorted(x for x in file_iter if x.is_file() and x.suffix.lower() in IMAGE_EXTNS)
        if not self.paths:
            raise FileNotFoundError(f"no images in {self.folder}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        path = self.paths[index]
        image, crop = load_crop_image_file(str(path), self.resolution, rng=self.rng)
        caption_file = path.with_suffix(self.caption_ext)
        caption = caption_file.read_text(encoding="utf-8") if caption_file.exists() else ""
        caption = clean_caption(
            caption,
            process_tags=self.process_tags,
            shuffle_tags=self.shuffle_tags,
            shuffle_keep=self.shuffle_keep,
            tag_sep=self.tag_sep,
            word_sep=self.word_sep,
            rng=self.rng,
        )
        return {self.image_key: image_to_array(image, getattr(self, 'image_dtype', 'float32')), self.caption_key: caption}

    def get_batch(self, indices: Sequence[int]) -> dict:
        return collate_dict_stack([self[i] for i in indices])

    def get_batch_iterator(self) -> Generator[list[int], None, None]:
        order = self.rng.permutation(len(self.paths))
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield [int(j) for j in order[i : i + self.batch_size]]


class FolderVAEDataset(FolderSquareDataset):
    """No-caption VAE variant (nocaption.py:19-78)."""

    def __getitem__(self, index: int) -> dict:
        path = self.paths[index]
        image, _ = load_crop_image_file(str(path), self.resolution, rng=self.rng)
        return {self.image_key: image_to_array(image, getattr(self, 'image_dtype', 'float32'))}


class MemeAspectDataset(ImageFolderDataset):
    """Aspect dataset with synthetic captions sampled from a global tag list
    (parity: dataset/imagefolder/meme.py:26-204): each image gets
    `tags_per_img` random tags from `tag_list_path`, optionally prepending
    `prepend_tag` with probability `prepend_rate`."""

    def __init__(
        self,
        folder,
        tag_list_path="tag_list.txt",
        tags_per_img: int = 50,
        prepend_tag: Optional[str] = None,
        prepend_rate: float = 0.0,
        **kwargs,
    ):
        tag_path = Path(tag_list_path)
        if not tag_path.is_absolute():
            tag_path = Path(folder) / tag_path
        self.tag_list = [t.strip() for t in tag_path.read_text().splitlines() if t.strip()]
        self.tags_per_img = tags_per_img
        self.prepend_tag = prepend_tag
        self.prepend_rate = prepend_rate
        kwargs.setdefault("process_tags", False)
        super().__init__(folder, **kwargs)

    def _load_meta(self, image_path: Path) -> dict:
        from PIL import Image

        with Image.open(image_path) as im:
            resolution = np.asarray(im.size, np.int32)
        aspect = float(resolution[0]) / float(resolution[1])
        return dict(
            image_path=str(image_path),
            caption="",  # synthesized per __getitem__
            aspect=np.float32(aspect),
            resolution=resolution,
            bucket_idx=np.int32(self.buckets.bucket_idx(aspect)),
        )

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        n = min(self.tags_per_img, len(self.tag_list))
        idxs = self.rng.choice(len(self.tag_list), size=n, replace=False)
        tags = [self.tag_list[i] for i in idxs]
        if self.prepend_tag and self.rng.random() < self.prepend_rate:
            tags = [self.prepend_tag] + tags
        sample[self.caption_key] = self.tag_sep.join(tags)
        return sample
