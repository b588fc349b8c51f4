"""Pallas implicit-GEMM 3x3 stride-1 SAME conv (NHWC, bf16) for ResBlocks.

The round-2b profile (NOTES.md) puts conv/dense fusions at 62% of the SDXL
step at ~54% MXU efficiency — XLA's conv emitter is the remaining wall. This
kernel reformulates the 3x3 conv as 9 shifted GEMMs accumulated in VMEM:

  out[(h,w), f] = Σ_{dy,dx,c} x_pad[h+dy, w+dx, c] · w[dy, dx, c, f]

Design (one grid step = one (batch, row-block, C-block) tile):
  - grid (B, H/bh, C/bc), C innermost ("arbitrary") for accumulation; the
    full F dimension lives in a single fp32 VMEM accumulator (bh·W, F) so
    the x tile is DMA'd ONCE per C-block, not once per F-block;
  - x stays in HBM (`pl.ANY`); the kernel DMAs the (bh+2, W+2, bc) halo
    tile itself — BlockSpec index maps cannot express overlapping blocks;
  - the 9 taps are static sublane shifts of the VMEM tile feeding
    (bh·W, bc) x (bc, F) MXU matmuls in bf16 with fp32 accumulate.

Backward: dx is exactly the same kernel applied to dy with the spatially
flipped, transposed filter (stride-1 SAME dgrad == conv); dw falls back to
XLA's wgrad (1/3 of bwd work; a dedicated wgrad kernel is a further step).

Use via layers.Conv2d on TPU (auto for 3x3/s1/SAME bf16 shapes) or directly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU correctness tests run the kernel in the Pallas interpreter
_INTERPRET = os.environ.get("NEUROSIS_PALLAS_INTERPRET", "") in ("1", "true")

# VMEM budget (v5e ~16 MiB augmented by spill tolerance): acc + w + 2x tile
_VMEM_LIMIT = 14 * 1024 * 1024


def _kernel(x_hbm, w_ref, o_ref, acc_ref, xt_ref, sem, *, bh, width, bc, feat):
    nc = pl.num_programs(2)
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

    # halo DMA: rows [hi*bh, hi*bh + bh+2) of the H-padded input
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(hi * bh, bh + 2), :, pl.ds(ci * bc, bc)],
        xt_ref,
        sem,
    )
    cp.start()

    @pl.when(ci == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cp.wait()

    for dy in range(3):
        for dx in range(3):
            # (bh, W, bc) static shifted window -> (bh*W, bc) GEMM lhs
            xt = xt_ref[dy : dy + bh, dx : dx + width, :].reshape(bh * width, bc)
            acc_ref[:] += jax.lax.dot_general(
                xt,
                w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ci == nc - 1)
    def _finalize():
        o_ref[0] = acc_ref[:].reshape(bh, width, feat).astype(o_ref.dtype)


def _pick_bh(h: int, w_len: int, feat: int, bc: int) -> int:
    """Largest row block with acc (bh*W, F) fp32 + tile + weights in VMEM."""
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        acc = bh * w_len * feat * 4
        tile = 2 * (bh + 2) * (w_len + 2) * bc * 2
        wbuf = 9 * bc * feat * 2
        if acc + tile + wbuf <= _VMEM_LIMIT and bh * w_len >= 128:
            return bh
    return 0


def _pick_bc(c: int) -> int:
    for bc in (512, 384, 256, 128):
        if c % bc == 0:
            return bc
    return c  # non-multiple-of-128 channel counts (320/960): single block


def _conv_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, width, c = x.shape
    feat = w.shape[3]
    bc = _pick_bc(c)
    bh = _pick_bh(h, width, feat, bc)
    if bh == 0:
        raise ValueError(f"no VMEM-feasible block for shape {x.shape}->{feat}")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = (b, h // bh, c // bc)

    w_spec = pl.BlockSpec((3, 3, bc, feat), lambda bi, hi, ci: (0, 0, ci, 0))
    o_spec = pl.BlockSpec((1, bh, width, feat), lambda bi, hi, ci: (bi, hi, 0, 0))

    kernel = functools.partial(_kernel, bh=bh, width=width, bc=bc, feat=feat)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, width, feat), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh * width, feat), jnp.float32),
            pltpu.VMEM((bh + 2, width + 2, bc), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * width * c * feat,
            bytes_accessed=2 * (b * h * width * (c + feat)) + 9 * c * feat * 2,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, w)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC (Pallas implicit GEMM)."""
    return _conv_fwd(x, w)


def _vjp_fwd(x, w):
    return _conv_fwd(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    # dgrad: stride-1 SAME conv of dy with the flipped, in/out-swapped filter
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _conv_fwd(dy, w_flip.astype(dy.dtype))
    # wgrad: XLA (x as NHWC lhs, dy as filter via batch/feature transposes)
    _, wgrad = jax.vjp(lambda wv: _xla_conv(x, wv), w)
    (dw,) = wgrad(dy)
    return dx, dw


conv3x3.defvjp(_vjp_fwd, _vjp_bwd)


def conv3x3_supported(x_shape, w_shape, stride, padding, dtype) -> bool:
    """Gate for layers.Conv2d: 3x3, stride 1, pad 1, bf16, MXU-worthy dims."""
    if tuple(w_shape[:2]) != (3, 3) or stride != 1 or padding != 1:
        return False
    if dtype not in (jnp.bfloat16,):
        return False
    _b, h, width, c = x_shape
    feat = w_shape[3]
    if c < 128 or feat < 128 or (h * width) < 1024:
        return False
    bc = _pick_bc(c)
    return _pick_bh(h, width, feat, bc) > 0
