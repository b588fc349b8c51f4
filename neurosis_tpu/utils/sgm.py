"""sgm-heritage utilities (parity: utils/sgm.py:1-177).

append_dims/append_zero live in utils.misc; here: text→image rendering for
conditioning logs, train-mode disabling analog, nested attribute access.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


def log_txt_as_img(wh: tuple, xc: Sequence[str], size: int = 10) -> np.ndarray:
    """Render captions onto white images for cond logging (utils/sgm.py parity).
    Returns [B, H, W, 3] float32 in [-1, 1]."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.truetype("DejaVuSans.ttf", size)
    except OSError:
        font = ImageFont.load_default()

    out = []
    for text in xc:
        img = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(img)
        nc = max(int(40 * (wh[0] / 256)), 1)
        lines = "\n".join(str(text)[i : i + nc] for i in range(0, len(str(text)), nc))
        draw.text((0, 0), lines, fill="black", font=font)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        out.append(arr)
    return np.stack(out)


def get_nested_attribute(obj: Any, path: str) -> Any:
    for part in path.split("."):
        obj = obj[int(part)] if part.isdigit() and not hasattr(obj, part) else getattr(obj, part)
    return obj


def expand_dims_like(x, target):
    import jax.numpy as jnp

    return jnp.reshape(x, x.shape + (1,) * (target.ndim - x.ndim))
