"""Pix2pix PatchGAN discriminator (parity: modules/losses/patchgan/model.py:6-92).

NHWC Flax with BatchNorm (mutable 'batch_stats' collection in training).
Init matches weights_init: conv N(0, 0.02), BN scale N(1, 0.02), zero bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _normal_init(stddev):
    return nn.initializers.normal(stddev)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """weights_init BN scale ~ N(1.0, 0.02) (patchgan/model.py:6-18)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kw, pad = 4, 1

        def conv(h, features, stride, name, use_bias=True):
            return nn.Conv(
                features,
                (kw, kw),
                strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=_normal_init(0.02),
                name=name,
            )(h)

        h = conv(x, self.ndf, 2, "layers.0")
        h = nn.leaky_relu(h, 0.2)

        layer_mult = 1
        li = 2  # torch ModuleList index bookkeeping (conv, norm, relu triples)
        for n in range(self.n_layers):
            layer_num = n + 1
            layer_mult = min(2**layer_num, 8)
            stride = 2 if layer_num < self.n_layers else 1
            h = conv(h, self.ndf * layer_mult, stride, f"layers.{li}", use_bias=False)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                scale_init=_bn_scale_init,
                name=f"layers.{li + 1}",
            )(h.astype(jnp.float32)).astype(h.dtype)
            h = nn.leaky_relu(h, 0.2)
            li += 3

        return conv(h, 1, 1, f"layers.{li}")
