"""Common NN building blocks (TPU-native, NHWC layout).

Behavioral parity targets (reference, for formula/shape contracts only):
  - timestep_embedding: modules/diffusion/util.py:152-178
  - Upsample/Downsample: modules/diffusion/openaimodel.py:96-199

Design notes (TPU-first):
  - All image tensors are NHWC (XLA's native conv layout on TPU); the torch
    reference is NCHW. Weight import transposes accordingly.
  - Norms compute in float32 regardless of the activation dtype (bf16-safe),
    then cast back — the XLA fuser folds the casts into neighbouring ops.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: int = 10000,
    repeat_only: bool = False,
) -> jax.Array:
    """Sinusoidal timestep embedding, [N] -> [N, dim]; cos-first ordering.

    Parity: modules/diffusion/util.py:152-178 (exp(-log(max_period)*i/half)).
    Always computed in float32 (frequencies underflow in bf16).
    """
    if repeat_only:
        return jnp.broadcast_to(timesteps.astype(jnp.float32)[:, None], (timesteps.shape[0], dim))
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 (matches torch GroupNorm numerics under AMP).

    The reference uses nn.GroupNorm(32, ch) with eps=1e-5 (UNet) or 1e-6 (VAE /
    SpatialTransformer input norm).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, fold: bool = False):
        if fold:
            # Fold to a per-(batch, channel) affine (a, b) with gn(x) ==
            # x*a + b, for fusion into a downstream conv (ops/conv3x3.py
            # gn_silu_conv3x3). Params live at the same tree path as the
            # unfused nn.GroupNorm child, so checkpoints are identical.
            scale, bias = _GNAffineParams(x.shape[-1], name="GroupNorm_0")()
            xf = x.astype(jnp.float32)
            bsz, h, w, c = x.shape
            g = self.num_groups
            xg = xf.reshape(bsz, h * w, g, c // g)
            mean = jnp.mean(xg, axis=(1, 3))
            # flax _compute_stats: var = max(0, E[x^2] - E[x]^2)
            var = jnp.maximum(jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean), 0.0)
            rstd = jax.lax.rsqrt(var + self.epsilon)
            rstd_c = jnp.repeat(rstd, c // g, axis=1)
            mean_c = jnp.repeat(mean, c // g, axis=1)
            a = scale[None, :] * rstd_c
            b = bias[None, :] - mean_c * a
            return a, b
        if gn_custom_vjp_enabled() and x.ndim == 4:
            # memory-efficient custom VJP: identical fp32 math, but the
            # backward saves bf16 x + tiny (B,G) stats instead of the fp32
            # normalized copy plain autodiff materializes (ops/groupnorm.py).
            # Param leaves live at the same tree path as nn.GroupNorm.
            from neurosis_tpu.ops.groupnorm import group_norm

            scale, bias = _GNAffineParams(x.shape[-1], name="GroupNorm_0")()
            return group_norm(x, scale, bias, self.num_groups, self.epsilon)
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        # NOTE (measured, round 2): a layout-friendly channel-moment rewrite
        # (per-channel E[x]/E[x^2] over major dims + tiny group combine) was
        # tried to dodge flax's [..., G, C/G] lane-splitting reshape — it
        # benched 3% SLOWER end-to-end (2.011 vs 2.072 steps/s on the SDXL
        # step): GN stats are bandwidth-bound real work either way, and the
        # extra repeat/reshape ops broke neighbouring fusions. Keep flax's.
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return out.astype(orig_dtype)


class _GNAffineParams(nn.Module):
    """Param-tree twin of flax nn.GroupNorm: declares the same scale/bias
    leaves (names, shapes, inits, fp32) without running the normalize."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return scale, bias


def gn_custom_vjp_enabled() -> bool:
    """NEUROSIS_GN_VJP=1 routes GroupNorm32 through the memory-efficient
    custom-VJP implementation (ops/groupnorm.py). Default OFF until the
    step-level A/B lands (candidate fix for the 512px VAE fp32-temporary
    fragmentation, BASELINE.md vae_train section)."""
    import os

    return os.environ.get("NEUROSIS_GN_VJP", "0").lower() in ("1", "true")


def conv_compute_dtype(module_dtype, x_dtype):
    """The dtype _RawConv actually computes in: dtype=None promotes the input
    with the fp32 params (nn.Conv promote_dtype semantics) — gates that check
    the raw x dtype would wrongly admit bf16 inputs to an fp32 compute."""
    return module_dtype or jnp.promote_types(x_dtype, jnp.float32)


def gn_conv_fuse_ok(x_shape, out_ch: int, module_dtype, x_dtype) -> bool:
    """Shared gate for the fused GN+SiLU->conv path (UNet ResBlock + VAE
    ResnetBlock): enabled, runnable (TPU/interpreter), and the Pallas kernel
    actually takes it — the unfused fallback is perf-neutral churn."""
    if not fused_gn_conv_enabled():
        return False
    try:
        from neurosis_tpu.ops.conv3x3 import (
            gn_silu_conv3x3_available,
            gn_silu_conv3x3_supported,
        )

        return gn_silu_conv3x3_available() and gn_silu_conv3x3_supported(
            x_shape,
            (3, 3, x_shape[-1], out_ch),
            1,
            1,
            conv_compute_dtype(module_dtype, x_dtype),
        )
    except Exception:  # pragma: no cover - dispatch probe only
        return False


def fused_gn_conv_enabled() -> bool:
    import os

    # default ON on TPU: step-level A/B (SDXL b2, with wide flash kernels)
    # measured 2.3479 vs 2.334 steps/s; numerics land CLOSER to the fp32
    # oracle than the unfused path (test_fused_gn_conv). Explicit
    # NEUROSIS_FUSED_GN_CONV=0/1 overrides (tests opt in under the
    # interpreter; CPU default stays off so interpret-mode env leakage can't
    # drag whole parity suites through interpreted kernels).
    val = os.environ.get("NEUROSIS_FUSED_GN_CONV", "").lower()
    if val:
        return val in ("1", "true")
    return jax.default_backend() == "tpu"


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """NHWC nearest-neighbour 2x upsample (== F.interpolate(mode='nearest'))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pallas_conv_enabled() -> bool:
    import os

    if os.environ.get("NEUROSIS_PALLAS_CONV", "").lower() in ("0", "false"):
        return False
    # default ON: +3.9% SDXL step (2.252 vs 2.168 steps/s) with the win-table
    # gate (tools/conv_bench.py A/B); NEUROSIS_PALLAS_CONV=0 disables
    return True


class _RawConv(nn.Module):
    """nn.Conv-compatible param layout ({kernel, bias}) with a switchable
    compute path: XLA conv_general_dilated or the Pallas implicit-GEMM 3x3
    kernel (ops/conv3x3.py). Named 'Conv_0' inside Conv2d so checkpoints are
    byte-identical to the nn.Conv tree."""

    features: int
    kernel_size: int
    stride: int
    pad: int
    use_bias: bool
    dtype: Optional[Dtype]
    kernel_init: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, gn_affine=None) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, self.kernel_size, in_ch, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        # match nn.Conv's promote_dtype: dtype=None promotes with the fp32
        # params (bf16 activations compute in fp32 unless dtype=bf16 is set)
        dtype = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
        if gn_affine is not None:
            # folded GroupNorm+SiLU producer: fuse into the Pallas kernel's
            # tile loads, or apply unfused before the XLA conv
            a, b = gn_affine
            if self.use_pallas:
                from neurosis_tpu.ops.conv3x3 import gn_silu_conv3x3

                y = gn_silu_conv3x3(x, a, b, kernel)
            else:
                from neurosis_tpu.ops.conv3x3 import gn_silu_affine

                y = jax.lax.conv_general_dilated(
                    gn_silu_affine(x, a, b),
                    kernel,
                    (self.stride, self.stride),
                    ((self.pad, self.pad), (self.pad, self.pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        elif self.use_pallas:
            from neurosis_tpu.ops.conv3x3 import conv3x3

            y = conv3x3(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                (self.stride, self.stride),
                ((self.pad, self.pad), (self.pad, self.pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class Conv2d(nn.Module):
    """3x3/1x1/kxk NHWC conv with torch-style explicit padding.

    On TPU with NEUROSIS_PALLAS_CONV=1, stride-1 SAME 3x3 bf16 convs at
    MXU-worthy shapes dispatch to the Pallas implicit-GEMM kernel
    (ops/conv3x3.py); everything else stays on XLA's conv emitter. The param
    tree is identical either way."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # default: kernel_size // 2
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, gn_affine=None) -> jax.Array:
        pad = self.padding if self.padding is not None else self.kernel_size // 2
        kernel_init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.lecun_normal()

        use_pallas = False
        if _pallas_conv_enabled():
            try:
                from neurosis_tpu.ops.conv3x3 import (
                    conv3x3_supported,
                    gn_silu_conv3x3_available,
                    gn_silu_conv3x3_supported,
                )

                dtype = conv_compute_dtype(self.dtype, x.dtype)
                wshape = (self.kernel_size, self.kernel_size, x.shape[-1], self.features)
                if gn_affine is not None:
                    use_pallas = gn_silu_conv3x3_available() and gn_silu_conv3x3_supported(
                        x.shape, wshape, self.stride, pad, dtype
                    )
                else:
                    use_pallas = jax.default_backend() == "tpu" and conv3x3_supported(
                        x.shape, wshape, self.stride, pad, dtype
                    )
            except Exception:  # pragma: no cover - dispatch probe only
                use_pallas = False

        return _RawConv(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            pad=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=kernel_init,
            use_pallas=use_pallas,
            name="Conv_0",
        )(x, gn_affine=gn_affine)


class Dense(nn.Module):
    """Linear layer; zero_init for reference zero_module() parity."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kernel_init,
            bias_init=nn.initializers.zeros_init(),
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + optional 3x3 conv (openaimodel.py:96-143)."""

    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = Conv2d(self.out_channels or self.channels, 3, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv or 2x2 avg-pool (openaimodel.py:146-199)."""

    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        if self.use_conv:
            return Conv2d(self.out_channels or self.channels, 3, stride=2, padding=1, dtype=self.dtype, name="op")(x)
        assert (self.out_channels or self.channels) == self.channels
        return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


class AlphaBlender(nn.Module):
    """Blend spatial/temporal branches by a (learnable) mix factor.

    Parity: modules/diffusion/util.py:237-286 (AlphaBlender). Strategies:
      - "fixed": alpha is a constant
      - "learned": alpha = sigmoid(mix_factor), a trained scalar
      - "learned_with_images": per-frame — alpha forced to 1 where
        image_only_indicator marks an image-only frame, sigmoid(mix_factor)
        elsewhere, then reshaped by `rearrange_pattern`

    out = alpha * x_spatial + (1 - alpha) * x_temporal
    """

    alpha: float
    merge_strategy: str = "learned_with_images"
    rearrange_pattern: str = "b t -> (b t) 1 1"

    def get_alpha(self, image_only_indicator: Optional[jax.Array] = None) -> jax.Array:
        if self.merge_strategy == "fixed":
            return jnp.asarray([self.alpha], jnp.float32)
        mix = self.param("mix_factor", lambda _: jnp.asarray([self.alpha], jnp.float32))
        if self.merge_strategy == "learned":
            return jax.nn.sigmoid(mix)
        if self.merge_strategy == "learned_with_images":
            assert image_only_indicator is not None, "need image_only_indicator"
            from einops import rearrange

            a = jnp.where(
                image_only_indicator.astype(bool),
                jnp.ones((1, 1), jnp.float32),
                jax.nn.sigmoid(mix)[..., None],
            )
            return rearrange(a, self.rearrange_pattern)
        raise ValueError(f"unknown merge strategy {self.merge_strategy}")

    @nn.compact
    def __call__(
        self,
        x_spatial: jax.Array,
        x_temporal: jax.Array,
        image_only_indicator: Optional[jax.Array] = None,
    ) -> jax.Array:
        alpha = self.get_alpha(image_only_indicator).astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
