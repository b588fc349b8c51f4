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


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (modules/layers.py:10-86).

    loc/scale are trained parameters initialised from the FIRST batch's
    per-channel moments — in Flax that is exactly `model.init(...)` on the
    first batch (the param init closures capture the input), after which they
    train as ordinary params. NHWC; 2-D inputs are treated as (B, C).
    """

    logdet: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, reverse: bool = False):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]
        x32 = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))  # (B, H, W) — channel stats
        loc = self.param("loc", lambda _: -jnp.mean(x32, axis=red))
        scale = self.param("scale", lambda _: 1.0 / (jnp.std(x32, axis=red) + 1e-6))
        if reverse:
            h = x32 / scale - loc
        else:
            h = scale * (x32 + loc)
        h = h.astype(x.dtype)
        if squeeze:
            h = h[:, 0, 0, :]
        if self.logdet and not reverse:
            height, width = x.shape[1], x.shape[2]
            ld = height * width * jnp.sum(jnp.log(jnp.abs(scale)))
            return h, ld * jnp.ones((x.shape[0],), jnp.float32)
        return h


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False  # ActNorm instead of BatchNorm (model.py:31-44)
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
            # torch: use_bias = norm_layer != BatchNorm2d (model.py:41-48)
            h = conv(h, self.ndf * layer_mult, stride, f"layers.{li}", use_bias=self.use_actnorm)
            if self.use_actnorm:
                h = ActNorm(name=f"layers.{li + 1}")(h)
            else:
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
