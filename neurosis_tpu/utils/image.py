"""Image utilities (parity: utils/image/{convert,grid,label}.py, utils/vae.py).

numpy/PIL only — converts model outputs ([-1,1] NHWC) to PIL, builds captioned
sample grids, stamps step labels.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def pil_pad_square(image, fill=(255, 255, 255)):
    """Pad a PIL image to a centered square canvas (utils/image/pil.py:16-27)."""
    from PIL import Image

    w, h = image.size
    px = max(image.size)
    canvas = Image.new("RGB", (px, px), fill)
    canvas.paste(image, ((px - w) // 2, (px - h) // 2))
    return canvas


def denormalize(x: np.ndarray) -> np.ndarray:
    """[-1,1] → [0,1] (utils/image/vae.py parity)."""
    return np.clip((np.asarray(x, np.float32) + 1.0) / 2.0, 0.0, 1.0)


def normalize(x: np.ndarray) -> np.ndarray:
    """[0,1] → [-1,1]."""
    return np.asarray(x, np.float32) * 2.0 - 1.0


def is_image_tensor(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] in (1, 3, 4)


def make_grid_nhwc(batch: np.ndarray, ncols: int = 4, pad: int = 0) -> np.ndarray:
    """Tile a (b, h, w, c) batch into one (H, W, c) image, row-major with
    `ncols` columns (torchvision make_grid role, NHWC layout)."""
    batch = np.asarray(batch)
    b, h, w, c = batch.shape
    ncols = max(1, min(ncols, b))
    nrows = (b + ncols - 1) // ncols
    out = np.zeros((nrows * (h + pad), ncols * (w + pad), c), batch.dtype)
    for i in range(b):
        r, col = divmod(i, ncols)
        out[r * (h + pad) : r * (h + pad) + h, col * (w + pad) : col * (w + pad) + w] = batch[i]
    return out


def diverging_colormap(x: np.ndarray) -> np.ndarray:
    """Map values in [0,1] to a blue→white→red diverging RGB ramp (float [0,1]).

    Numpy stand-in for the reference's `cet_gwv_r` colorcet map
    (vae_lpips_discr.py:223): 0.5 is neutral white, extremes are saturated."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    t = np.abs(x - 0.5) * 2.0  # 0 at center, 1 at extremes
    lo = np.array([0.18, 0.33, 0.80], np.float32)  # cold end
    hi = np.array([0.80, 0.20, 0.15], np.float32)  # hot end
    white = np.ones(3, np.float32)
    cold = white[None] + (lo - white)[None] * t[..., None].reshape(-1, 1)
    warm = white[None] + (hi - white)[None] * t[..., None].reshape(-1, 1)
    flat = np.where((x >= 0.5).reshape(-1, 1), warm, cold)
    return flat.reshape(x.shape + (3,))


def array_to_pil(x: np.ndarray):
    """[-1,1] or [0,1] HWC float → PIL RGB."""
    from PIL import Image

    x = np.asarray(x, np.float32)
    if x.min() < -0.01:
        x = denormalize(x)
    arr = (np.clip(x, 0, 1) * 255).round().astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    return Image.fromarray(arr)


def _default_font(size: int = 12):
    """Packaged NotoSansMono (parity: reference ships the same font under
    src/neurosis/data/fonts), falling back to system DejaVu / PIL default."""
    from PIL import ImageFont

    from neurosis_tpu.assets import asset_path

    packaged = asset_path("fonts", "NotoSansMono.ttf")
    if packaged is not None:
        try:
            return ImageFont.truetype(str(packaged), size)
        except OSError:
            pass
    try:
        return ImageFont.truetype("DejaVuSans.ttf", size)
    except OSError:
        return ImageFont.load_default()


def wrap_caption(text: str, font, max_width: int, draw, max_lines: int = 4) -> list:
    """Greedy word-wrap to a pixel width (utils/image/grid.py:71-90
    wrap_captions contract); the last kept line is ellipsised if truncated."""
    words = str(text).split()
    lines: list = []
    cur = ""
    for word in words:
        cand = f"{cur} {word}".strip()
        if draw.textlength(cand, font=font) <= max_width or not cur:
            cur = cand
        else:
            lines.append(cur)
            cur = word
    if cur:
        lines.append(cur)
    if len(lines) > max_lines:
        lines = lines[:max_lines]
        lines[-1] += "…"
    return lines


def caption_grid(
    images: Sequence, captions: Optional[Sequence[str]] = None, cols: int = 2, pad: int = 4,
    caption_height: Optional[int] = None,
):
    """Captioned grid of PIL images (utils/image/grid.py CaptionGrid parity);
    captions word-wrap to the cell width, the caption band grows to fit."""
    from PIL import Image, ImageDraw

    images = [array_to_pil(im) if not hasattr(im, "save") else im for im in images]
    n = len(images)
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    w = max(im.width for im in images)
    h = max(im.height for im in images)

    font = _default_font()
    measurer = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    line_h = (measurer.textbbox((0, 0), "Ag", font=font)[3]) + 2
    wrapped: list = []
    if captions:
        wrapped = [wrap_caption(c, font, w - 4, measurer) for c in captions]
    if caption_height is not None:
        cap_h = caption_height if captions else 0
    else:
        cap_h = (max((len(ls) for ls in wrapped), default=0) * line_h + 4) if captions else 0

    grid = Image.new("RGB", (cols * (w + pad) + pad, rows * (h + cap_h + pad) + pad), (24, 24, 24))
    draw = ImageDraw.Draw(grid)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        x0 = pad + c * (w + pad)
        y0 = pad + r * (h + cap_h + pad)
        grid.paste(im, (x0, y0))
        if captions and i < len(wrapped):
            for j, line in enumerate(wrapped[i][: max(1, cap_h // line_h)]):
                draw.text((x0 + 2, y0 + h + 2 + j * line_h), line, fill=(230, 230, 230), font=font)
    return grid


def stamp_label(image, text: str, corner: str = "tl"):
    """Step-label stamping (utils/image/label.py:8-44)."""
    from PIL import ImageDraw

    draw = ImageDraw.Draw(image)
    font = _default_font()
    bbox = draw.textbbox((0, 0), text, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    pos = {
        "tl": (4, 4),
        "tr": (image.width - tw - 4, 4),
        "bl": (4, image.height - th - 4),
        "br": (image.width - tw - 4, image.height - th - 4),
    }[corner]
    draw.rectangle([pos[0] - 2, pos[1] - 2, pos[0] + tw + 2, pos[1] + th + 2], fill=(0, 0, 0))
    draw.text(pos, text, fill=(255, 255, 255), font=font)
    return image


def save_image_grid(images, path, captions=None, cols: int = 2, label: Optional[str] = None):
    grid = caption_grid(images, captions, cols=cols)
    if label:
        grid = stamp_label(grid, label)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    grid.save(path)
    return path
