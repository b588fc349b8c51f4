"""Memory-efficient GroupNorm with a custom VJP (bf16 residuals, fp32 math).

Motivation (measured, round 5): the VAE-GAN G step at 512px is fragmented into
elementwise/normalization/copy work (BASELINE.md "vae_train 512px"), and the
b2 no-remat configuration OOMs HBM on the fp32 GroupNorm temporaries that
plain autodiff of `x.astype(f32) -> nn.GroupNorm -> astype(bf16)` saves for
the backward: the converted fp32 copy of every normalized activation is a
residual (2x the bytes of the bf16 activation), and the backward re-reads it.

This implementation computes identical math (flax `nn.GroupNorm` semantics:
fp32 stats with `var = max(0, E[x^2] - E[x]^2)`, normalize in fp32, cast back)
but saves only the ORIGINAL input (bf16 when the net runs bf16) plus the tiny
per-(batch, group) fp32 mean/rstd. The backward recomputes x_hat on the fly
inside fused reductions, so no fp32 copy of the activation is ever
materialized in HBM in either direction.

Gradient formulas (standard GroupNorm backward; N = H*W*C/G elements/group):
    t       = dy * scale                      (per-channel scale)
    dx      = rstd * (t - mean_g(t) - x_hat * mean_g(t * x_hat))
    dscale  = sum_{B,H,W} dy * x_hat
    dbias   = sum_{B,H,W} dy

Parity: torch nn.GroupNorm under AMP (fp32 island) — the reference's norm
numerics (modules/diffusion/model.py Normalize / openaimodel.py GroupNorm32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _stats(x: jax.Array, num_groups: int, eps: float):
    """Per-(batch, group) fp32 mean/rstd. The f32 convert fuses into the
    reductions — no fp32 copy of x is materialized."""
    b, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3))
    # flax _compute_stats: var = max(0, E[x^2] - E[x]^2)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _expand(stat: jax.Array, c: int) -> jax.Array:
    """(B, G) -> (B, 1, 1, C) by repeating each group's value C/G times."""
    b, g = stat.shape
    return jnp.repeat(stat, c // g, axis=1).reshape(b, 1, 1, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, num_groups: int, eps: float):
    """GroupNorm over the channel-last axis of NHWC `x`, fp32 math, output in
    x.dtype. scale/bias are per-channel fp32."""
    mean, rstd = _stats(x, num_groups, eps)
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xhat = (xf - _expand(mean, c)) * _expand(rstd, c)
    out = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _fwd(x, scale, bias, num_groups, eps):
    mean, rstd = _stats(x, num_groups, eps)
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xhat = (xf - _expand(mean, c)) * _expand(rstd, c)
    out = (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    # residuals: original-dtype x + tiny fp32 stats — NOT the fp32 xhat
    return out, (x, scale, mean, rstd)


def _bwd(num_groups, eps, res, dy):
    x, scale, mean, rstd = res
    b, h, w, c = x.shape
    g = num_groups
    n = h * w * (c // g)

    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - _expand(mean, c)) * _expand(rstd, c)

    # per-channel param grads (fp32 accumulate; converts fuse into reduces)
    dbias = jnp.sum(dyf, axis=(0, 1, 2))
    dscale = jnp.sum(dyf * xhat, axis=(0, 1, 2))

    # per-(batch, group) moments of t = dy * scale
    t = dyf * scale.astype(jnp.float32)
    tg = t.reshape(b, h * w, g, c // g)
    xhg = xhat.reshape(b, h * w, g, c // g)
    sum_t = jnp.sum(tg, axis=(1, 3))
    sum_txhat = jnp.sum(tg * xhg, axis=(1, 3))

    dx = _expand(rstd, c) * (
        t - _expand(sum_t / n, c) - xhat * _expand(sum_txhat / n, c)
    )
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


group_norm.defvjp(_fwd, _bwd)
