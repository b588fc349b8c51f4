"""Dataset utilities: PIL crops with coord capture, tag cleaning, numpy collate.

Parity: dataset/utils.py:36-191 (pil_crop_square/random/bucket return
(image, (top, left)); collate stacks tensors and byte-encodes strings). Torch
tensors are replaced by numpy NHWC arrays — the train loop device_puts them.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np


def pil_ensure_rgb(image) -> "object":
    from PIL import Image

    if image.mode not in ("RGB", "RGBA"):
        image = image.convert("RGBA") if "transparency" in image.info else image.convert("RGB")
    if image.mode == "RGBA":
        from PIL import Image as _I

        canvas = _I.new("RGBA", image.size, (255, 255, 255))
        canvas.alpha_composite(image)
        image = canvas.convert("RGB")
    return image


def pil_crop_square(image, size, resampling=None, rng: Optional[np.random.Generator] = None):
    from PIL import Image, ImageOps

    resampling = resampling or Image.Resampling.BICUBIC
    rng = rng or np.random.default_rng()
    if isinstance(size, int):
        size = (size, size)
    image = ImageOps.cover(image, size, method=resampling)
    min_edge = min(image.size)
    delta_w, delta_h = image.size[0] - min_edge, image.size[1] - min_edge
    if all((delta_w, delta_h)):
        raise ValueError(f"Failed to crop short edge to match {size}!")
    top = int(rng.integers(delta_h + 1))
    left = int(rng.integers(delta_w + 1))
    image = image.crop((left, top, left + size[0], top + size[1]))
    return image, (top, left)


def pil_crop_bucket(image, bucket, resampling=None, rng: Optional[np.random.Generator] = None):
    """Cover-resize to the bucket then random-crop the long edge; returns
    (image, (top, left)) for SDXL crop conditioning (dataset/utils.py:103-125)."""
    from PIL import Image, ImageOps

    resampling = resampling or Image.Resampling.BICUBIC
    rng = rng or np.random.default_rng()
    image = ImageOps.cover(image, bucket.size, method=resampling)
    width, height = image.size
    delta_w = width - bucket.width
    delta_h = height - bucket.height
    if delta_w != 0 and delta_h != 0:
        raise ValueError(f"Failed to crop short edge to match {bucket}!")
    if delta_w == 0 and delta_h == 0:
        return image, (0, 0)
    top = int(rng.integers(delta_h + 1))
    left = int(rng.integers(delta_w + 1))
    image = image.crop((left, top, left + bucket.width, top + bucket.height))
    return image, (top, left)


def load_bucket_image_file(path, bucket, resampling=None, rng=None):
    from PIL import Image

    if isinstance(path, bytes):
        path = path.decode("utf-8")
    image = pil_ensure_rgb(Image.open(Path(path)))
    return pil_crop_bucket(image, bucket, resampling, rng)


def load_crop_image_file(path, resolution, resampling=None, rng=None):
    from PIL import Image

    if isinstance(path, bytes):
        path = path.decode("utf-8")
    image = pil_ensure_rgb(Image.open(Path(path)))
    return pil_crop_square(image, resolution, resampling, rng)


def image_to_array(image, dtype: str = "float32") -> np.ndarray:
    """PIL RGB → float32 NHWC in [-1, 1] (base.py default transforms parity:
    ToImage → scale to [0,1] → Normalize(.5,.5)).

    Dispatches to the native C++ core (neurosis_tpu.native, fused u8→f32
    normalize, OpenMP) when built; numpy otherwise (both use x*(2/255)-1,
    which agrees with /255*2-1 to 1 ulp over all uint8 values).

    dtype="uint8": the int8 input path — keep raw uint8 HWC (zero host float
    work, 4x fewer host→device bytes); the engines dequantize in-graph
    (ops/dequant.py)."""
    arr = np.asarray(image)
    if dtype == "uint8":
        return arr if arr.dtype == np.uint8 else np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    if arr.dtype == np.uint8:
        from neurosis_tpu import native

        return native.u8_to_f32_norm(arr)
    return np.asarray(arr, dtype=np.float32) / 255.0 * 2.0 - 1.0


def clean_word(word_sep: str, word: Union[str, bytes]) -> str:
    if isinstance(word, (bytes, np.bytes_)):
        word = word.decode("utf-8")
    return word.replace("_", word_sep).replace(" ", word_sep).strip()


def clean_caption(
    caption: str,
    process_tags: bool = True,
    shuffle_tags: bool = False,
    shuffle_keep: int = 0,
    tag_sep: str = ", ",
    word_sep: str = " ",
    rng: Optional[np.random.Generator] = None,
) -> str:
    """Tag clean/shuffle (imagefolder/aspect.py:129-144)."""
    if not process_tags:
        return caption.strip()
    rng = rng or np.random.default_rng()
    tags = [clean_word(word_sep, x) for x in caption.split(", ")]
    if shuffle_tags:
        if shuffle_keep > 0:
            tags = tags[:shuffle_keep] + [tags[shuffle_keep:][i] for i in rng.permutation(len(tags) - shuffle_keep)]
        else:
            tags = [tags[i] for i in rng.permutation(len(tags))]
    return tag_sep.join(tags).strip()


def pil_crop_random(image, size, resampling=None, rng: Optional[np.random.Generator] = None):
    """Random crop at (roughly) native resolution (dataset/utils.py:61-87):
    upscale if smaller than target, downscale to ≤2x target if much larger,
    then random-crop to exactly `size`; returns (image, (top, left))."""
    from PIL import Image, ImageOps

    resampling = resampling or Image.Resampling.BICUBIC
    rng = rng or np.random.default_rng()
    if isinstance(size, int):
        size = (size, size)
    if image.size == size:
        return image, (0, 0)
    if image.size[0] < size[0] or image.size[1] < size[1]:
        image = ImageOps.cover(image, size, method=Image.Resampling.LANCZOS)
    if image.size[0] > size[0] * 2 and image.size[1] > size[1] * 2:
        image = ImageOps.cover(image, (size[0] * 2, size[1] * 2), method=resampling)
    delta_w, delta_h = image.size[0] - size[0], image.size[1] - size[1]
    top = int(rng.integers(delta_h + 1))
    left = int(rng.integers(delta_w + 1))
    image = image.crop((left, top, left + size[0], top + size[1]))
    return image, (top, left)


def collate_dict_lists(samples: Sequence[dict]) -> dict:
    """list-of-dicts → dict-of-lists, stacking array-valued keys
    (dataset/utils.py:150-164 contract, numpy edition)."""
    out: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


def collate_dict_stack(samples: Sequence[dict]) -> dict:
    """list-of-dicts → dict of stacked numpy arrays / string lists
    (dataset/utils.py:150-191 contract, numpy edition)."""
    out: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        v0 = vals[0]
        if isinstance(v0, np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        elif isinstance(v0, (tuple, list)) and v0 and isinstance(v0[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals, dtype=np.float32)
        else:
            out[key] = list(vals)
    return out


def shuffled_chunk_batches(n: int, batch_size: int, rng: Optional[np.random.Generator] = None):
    """Shuffled fixed-size index chunks (the no-bucket batch schedule shared
    by the square/VAE datasets and the HF adapter); drops the ragged tail."""
    rng = rng or np.random.default_rng()
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)
    n_full = n // batch_size

    def it():
        for b in range(n_full):
            yield [int(i) for i in order[b * batch_size : (b + 1) * batch_size]]

    return it()


def cropped_sample_fields(image, bucket=None, resolution=None, rng=None, clamp_orig=True):
    """Cover-resize + random-crop (aspect bucket or fixed square) and return
    `(image_array, micro_cond_fields)` — the SDXL conditioning tuple shared by
    the folder/mongo/HF datasets (original size optionally clamped to the
    crop target, imagefolder/aspect.py:74-85 contract)."""
    orig = image.size
    if bucket is not None:
        image, crop = pil_crop_bucket(image, bucket, rng=rng)
        target = bucket.size
    else:
        resolution = (resolution, resolution) if isinstance(resolution, int) else tuple(resolution)
        image, crop = pil_crop_square(image, resolution, rng=rng)
        target = resolution
    osize = (min(orig[0], target[0]), min(orig[1], target[1])) if clamp_orig else tuple(orig)
    return image_to_array(image), {
        "original_size_as_tuple": osize,
        "crop_coords_top_left": crop,
        "target_size_as_tuple": tuple(target),
    }
