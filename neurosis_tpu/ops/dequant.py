"""Device-side image dequantization (the int8 input path).

The reference normalizes uint8 → float32 [-1,1] on the HOST inside its
transforms (dataset/base.py:25-49), so every image crosses host→device as 4
bytes/px/channel. TPU-first alternative: keep batches uint8 end-to-end on the
host (data/*.py image_dtype="uint8"), transfer 1 byte/px/channel (4x fewer
PCIe/infeed bytes, zero host float work), and dequantize IN-GRAPH where XLA
fuses the multiply-add into the consumer (the VAE conv_in's input load).

Numerics: x*(2/255)-1 — identical to the host path (data/utils.py
image_to_array), which agrees with /255*2-1 to 1 ulp over all uint8 values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dequant_image(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 images → [-1, 1] float in-graph; float inputs pass through
    (the engines call this unconditionally, so both input paths work)."""
    if x.dtype == jnp.uint8:
        return x.astype(dtype) * jnp.asarray(2.0 / 255.0, dtype) - jnp.asarray(1.0, dtype)
    return x
