"""8-bit AdamW: blockwise-quantized optimizer state (optax transform).

Parity target: the reference's configs select `bitsandbytes.optim.AdamW8bit`
by class_path (e.g. configs/sdxl/sdxl-te.example.yaml); bnb keeps Adam's two
moments in 8-bit codes with per-block absmax scaling ("blockwise dynamic
quantization") and dequantizes on the fly. CUDA bnb does this inside a fused
kernel; the TPU-native equivalent below keeps the same state layout
(int8 codes + one fp32 scale per block of 256) but uses an *analytic*
log-spaced codebook so quant/dequant are pure VPU exp2/log2 math — no
codebook gathers, which XLA fuses straight into the update.

Codebook (per block, x normalized by the block absmax so |x| ≤ 1):
  - signed (momentum m):   code k ∈ [-127, 127], |x| ≈ 10**(7·(|k|-1)/126 - 7)
    — 127 log-spaced magnitude levels over 7 decades + exact 0; max relative
    error ≈ 6.6% (matches bnb's dynamic-map error regime).
  - unsigned (variance v): code k ∈ [0, 255], x ≈ 10**(10·(k-1)/254 - 10)
    — 255 levels over 10 decades + exact 0 (v has a huge dynamic range; the
    sqrt in Adam halves the error's effect on the step).

Like bnb, tensors with fewer than `min_8bit_size` elements keep fp32 state
(quantization noise matters most for small, fast-moving tensors and saves no
real memory there).

Memory: 2 × (8 bits + 32/block_size bits) ≈ 16.25 bits/param of optimizer
state vs 64 for fp32 Adam — the difference between fitting and OOMing a
fine-tune on a 16 GB chip.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

_SIGNED_DECADES = 7.0
_UNSIGNED_DECADES = 10.0


class Quantized8bit(NamedTuple):
    """A leaf's 8-bit state: codes padded/reshaped to (nblocks, block)."""

    codes: jax.Array  # int8 (signed) or uint8-in-int8 (unsigned), (nb, bs)
    scale: jax.Array  # fp32 per-block absmax, (nb, 1)


def _quantize_signed(x: jax.Array, block_size: int) -> Quantized8bit:
    flat = x.astype(jnp.float32).ravel()
    pad = (-flat.size) % block_size
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block_size)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    safe = jnp.maximum(scale, 1e-30)
    n = jnp.abs(blocks) / safe  # ∈ [0, 1]
    # k = 1..127 spans 10^-7..10^0; n below 10^-7 rounds to code 0 (exact 0)
    mag = jnp.clip(
        jnp.round((jnp.log10(jnp.maximum(n, 1e-38)) + _SIGNED_DECADES) * 126.0 / _SIGNED_DECADES) + 1.0,
        0.0,
        127.0,
    )
    mag = jnp.where(n < 10.0 ** (-_SIGNED_DECADES), 0.0, mag)
    codes = (jnp.sign(blocks) * mag).astype(jnp.int8)
    return Quantized8bit(codes=codes, scale=scale)


def _dequantize_signed(q: Quantized8bit, size: int, shape) -> jax.Array:
    k = q.codes.astype(jnp.float32)
    mag = jnp.exp2(jnp.float32(_SIGNED_DECADES * jnp.log2(10.0)) * ((jnp.abs(k) - 1.0) / 126.0 - 1.0))
    x = jnp.sign(k) * jnp.where(k == 0.0, 0.0, mag) * q.scale
    return x.ravel()[:size].reshape(shape)


def _quantize_unsigned(x: jax.Array, block_size: int) -> Quantized8bit:
    flat = x.astype(jnp.float32).ravel()
    pad = (-flat.size) % block_size
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block_size)
    scale = jnp.max(blocks, axis=1, keepdims=True)
    safe = jnp.maximum(scale, 1e-30)
    n = blocks / safe
    k = jnp.clip(
        jnp.round((jnp.log10(jnp.maximum(n, 1e-38)) + _UNSIGNED_DECADES) * 254.0 / _UNSIGNED_DECADES) + 1.0,
        0.0,
        255.0,
    )
    k = jnp.where(n < 10.0 ** (-_UNSIGNED_DECADES), 0.0, k)
    # stored as int8 bit-pattern; interpreted mod 256 on dequant
    return Quantized8bit(codes=k.astype(jnp.uint8).view(jnp.int8), scale=scale)


def _dequantize_unsigned(q: Quantized8bit, size: int, shape) -> jax.Array:
    k = q.codes.view(jnp.uint8).astype(jnp.float32)
    mag = jnp.exp2(jnp.float32(_UNSIGNED_DECADES * jnp.log2(10.0)) * ((k - 1.0) / 254.0 - 1.0))
    x = jnp.where(k == 0.0, 0.0, mag) * q.scale
    return x.ravel()[:size].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: optax.Params  # per-leaf: Quantized8bit | fp32 array (small leaves)
    nu: optax.Params


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 256,
    min_8bit_size: int = 4096,
) -> optax.GradientTransformation:
    """Adam moment tracking with blockwise 8-bit moment storage."""

    def use_8bit(leaf) -> bool:
        return leaf.size >= min_8bit_size

    def init_fn(params):
        def init_leaf_mu(p):
            z = jnp.zeros(p.shape, jnp.float32)
            return _quantize_signed(z, block_size) if use_8bit(p) else z

        def init_leaf_nu(p):
            z = jnp.zeros(p.shape, jnp.float32)
            return _quantize_unsigned(z, block_size) if use_8bit(p) else z

        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(init_leaf_mu, params),
            nu=jax.tree_util.tree_map(init_leaf_nu, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf_update(g, mu_q, nu_q):
            g32 = g.astype(jnp.float32)
            if isinstance(mu_q, Quantized8bit):
                mu = _dequantize_signed(mu_q, g.size, g.shape)
                nu = _dequantize_unsigned(nu_q, g.size, g.shape)
            else:
                mu, nu = mu_q, nu_q
            mu = b1 * mu + (1.0 - b1) * g32
            nu = b2 * nu + (1.0 - b2) * jnp.square(g32)
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            if isinstance(mu_q, Quantized8bit):
                mu_out: Union[Quantized8bit, jax.Array] = _quantize_signed(mu, block_size)
                nu_out: Union[Quantized8bit, jax.Array] = _quantize_unsigned(nu, block_size)
            else:
                mu_out, nu_out = mu, nu
            return step.astype(g.dtype), mu_out, nu_out

        def is_leaf(x):
            return isinstance(x, Quantized8bit)

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = jax.tree_util.tree_leaves(state.mu, is_leaf=is_leaf)
        flat_nu = jax.tree_util.tree_leaves(state.nu, is_leaf=is_leaf)
        out = [leaf_update(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        steps = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate: Union[float, optax.Schedule] = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block_size: int = 256,
    min_8bit_size: int = 4096,
    mask: Optional[optax.Params] = None,
) -> optax.GradientTransformation:
    """bnb `AdamW8bit` equivalent: AdamW with 8-bit blockwise moment state."""
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, block_size=block_size, min_8bit_size=min_8bit_size),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
