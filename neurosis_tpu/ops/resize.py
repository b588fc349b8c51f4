"""Exact torch-semantics bicubic resize as separable matmuls.

Parity target: the reference preprocesses CLIP-image inputs with
`kornia.geometry.resize(x, (224,224), 'bicubic', align_corners=True,
antialias=True)` (models/text_encoder/clip.py:439-451), which delegates to
`torch.nn.functional.interpolate`. Matching those resampling semantics
exactly matters: a different filter silently shifts every image embedding.

TPU-first design: interpolation weights depend only on the static
(in_size, out_size, align_corners, antialias) tuple, so they are computed
host-side with numpy (mirroring ATen's UpSampleKernel weight computation)
and baked into the program as constant matrices; the resize itself is two
dense matmuls (rows then columns) that XLA maps straight onto the MXU —
no gathers, no dynamic indexing.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's bicubic coefficient


def _cubic(x: np.ndarray, a: float = _A) -> np.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _pixel_scale(in_size: int, out_size: int, align_corners: bool) -> float:
    """ATen area_pixel_compute_scale."""
    if align_corners:
        return (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    return in_size / out_size


@lru_cache(maxsize=64)
def _weight_matrix(
    in_size: int,
    out_size: int,
    align_corners: bool,
    antialias: bool,
    scale_override: float = 0.0,
) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix, mirroring
    ATen UpSampleKernel:
      - antialias path (_compute_indices_weights_aa): kernel support widened
        by the scale on downscale, weights renormalized;
      - plain path: classic 4-tap cubic at the source coordinate, edge-clamped.

    scale_override > 0 reproduces `F.interpolate(scale_factor=s)` semantics:
    ATen maps coordinates with 1/s, NOT out/in (compute_scales_value) — the
    DreamSim ViT's pos-embed interpolation depends on this (vit.py:289-297
    passes a +0.1-fudged scale_factor).
    """
    scale = scale_override if scale_override > 0 else _pixel_scale(in_size, out_size, align_corners)
    W = np.zeros((out_size, in_size), np.float64)

    if antialias:
        # ATen _compute_indices_weights_aa: PIL-style kernel (a=-0.5), kernel
        # support widened by the scale on downscale, weights renormalized;
        # align_corners only changes `scale`, not the center formula.
        support = 2.0 * scale if scale > 1.0 else 2.0
        invscale = 1.0 / scale if scale > 1.0 else 1.0
        for i in range(out_size):
            center = scale * (i + 0.5)
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            js = np.arange(xmin, xmax)
            w = _cubic((js + 0.5 - center) * invscale, a=-0.5)
            s = w.sum()
            if s != 0:
                w = w / s
            W[i, xmin:xmax] = w
        return W.astype(np.float32)

    # non-antialiased (or upscale, where torch's AA path degenerates to this):
    # 4 taps around the source coordinate, indices clamped at the edges
    for i in range(out_size):
        if align_corners:
            real = scale * i
        else:
            real = scale * (i + 0.5) - 0.5
        in_i = int(np.floor(real))
        t = real - in_i
        idx = np.clip(np.arange(in_i - 1, in_i + 3), 0, in_size - 1)
        w = _cubic(np.array([1.0 + t, t, 1.0 - t, 2.0 - t]))
        for j, wj in zip(idx, w):
            W[i, j] += wj
    return W.astype(np.float32)


def bicubic_resize(
    x: jnp.ndarray,
    size: tuple,
    align_corners: bool = False,
    antialias: bool = True,
    scales: tuple = (0.0, 0.0),
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to `size=(H, W)` with torch
    `interpolate(mode='bicubic')` semantics. Runs as two matmuls.
    `scales=(1/sf_h, 1/sf_w)` overrides the coordinate-mapping scale for
    `F.interpolate(scale_factor=...)` parity (0 = derive from sizes)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    import jax

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # HIGHEST: fp32 MXU passes — the matrices are tiny and filter exactness
    # is the point (bf16 default precision shifts pixels by ~3e-3)
    hi = jax.lax.Precision.HIGHEST
    if h != out_h:
        wh = jnp.asarray(_weight_matrix(h, out_h, align_corners, antialias, scales[0]))
        xf = jnp.einsum("oh,bhwc->bowc", wh, xf, precision=hi)
    if w != out_w:
        ww = jnp.asarray(_weight_matrix(w, out_w, align_corners, antialias, scales[1]))
        xf = jnp.einsum("ow,bhwc->bhoc", ww, xf, precision=hi)
    out = xf.astype(dtype)
    return out[0] if squeeze else out
