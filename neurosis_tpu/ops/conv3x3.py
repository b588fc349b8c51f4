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

# default scoped-VMEM limit is 16 MiB (xla_tpu_scoped_vmem_limit_kib)
_VMEM_LIMIT = 14 * 1024 * 1024


def _kernel(x_hbm, w_ref, o_ref, acc_ref, xt_ref, sem, *, bh, width, w_halo, bc, feat):
    nc = pl.num_programs(2)
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

    # halo DMA: rows [hi*bh, hi*bh + bh+2) of the H-padded input; the W dim
    # is pre-padded to w_halo (multiple of 8 — DMA sublane tiling)
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


def _vmem_use(bh: int, w_len: int, w_halo: int, bc: int, feat: int, tile_mult: int = 1) -> int:
    """Pipeline VMEM: fp32 acc + DOUBLE-buffered w/out blocks + halo tile.
    tile_mult budgets in-kernel temporaries over the tile (the fused-GN
    normalize holds an fp32 copy of the bf16 tile: mult 3)."""
    acc = bh * w_len * feat * 4
    wbuf = 2 * 9 * bc * feat * 2
    out = 2 * bh * w_len * feat * 2
    tile = (bh + 2) * w_halo * bc * 2 * tile_mult
    return acc + wbuf + out + tile


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _pick_blocks(h: int, w_len: int, c: int, feat: int, tile_mult: int = 1):
    """(bh, bc) fitting the scoped-VMEM limit with the largest GEMM tiles.
    c/feat are the 128-padded dims (lane tiling: DMA slices and blocks must
    be 128-aligned on the minor dim)."""
    w_halo = ((w_len + 2 + 7) // 8) * 8
    bcs = [bc for bc in (384, 256, 128) if c % bc == 0]
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh or bh * w_len < 128:
            continue
        for bc in bcs:
            if _vmem_use(bh, w_len, w_halo, bc, feat, tile_mult) <= _VMEM_LIMIT:
                return bh, bc
    return 0, 0


def _conv_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, width, c = x.shape
    feat = w.shape[3]
    # lane tiling: C/F padded to multiples of 128 (320/960-channel UNet levels)
    c_pad, f_pad = _round128(c), _round128(feat)
    bh, bc = _pick_blocks(h, width, c_pad, f_pad)
    if bh == 0:
        raise ValueError(f"no VMEM-feasible block for shape {x.shape}->{feat}")

    # W halo padded to a multiple of 8: the DMA'd tile's sublane dim
    w_halo = ((width + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_halo - width - 1), (0, c_pad - c)))
    if (c_pad, f_pad) != (c, feat):
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c), (0, f_pad - feat)))
    grid = (b, h // bh, c_pad // bc)

    w_spec = pl.BlockSpec((3, 3, bc, f_pad), lambda bi, hi, ci: (0, 0, ci, 0))
    o_spec = pl.BlockSpec((1, bh, width, f_pad), lambda bi, hi, ci: (bi, hi, 0, 0))

    kernel = functools.partial(_kernel, bh=bh, width=width, w_halo=w_halo, bc=bc, feat=f_pad)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, width, f_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh * width, f_pad), jnp.float32),
            pltpu.VMEM((bh + 2, w_halo, bc), x.dtype),
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
    return out[..., :feat] if f_pad != feat else out


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ---------------------------------------------------------------------------
# Fused GroupNorm+SiLU -> conv3x3
#
# The ResBlock pattern GN -> SiLU -> 3x3 conv (reference openaimodel.py
# in_layers/out_layers) materializes the activated tensor between the norm
# and the conv: XLA cannot fuse elementwise producers into a convolution, so
# the step pays a full write + read of the activation per pair (the "loop
# fusions" bucket in the NOTES profile). Here GroupNorm folds to a per-
# (batch, channel) affine a,b computed OUTSIDE the kernel from one stats
# pass over x (a = gamma*rstd, b = beta - mean*a), and the conv kernel
# normalizes + SiLUs its halo tiles in VMEM right after the DMA — the
# activated tensor never exists in HBM.
#
# Gradient strategy: the custom_vjp treats (x, a, b) as independent inputs
# and returns only the DIRECT partials (dpre*a, sum(dpre*x), sum(dpre));
# since a,b are traced functions of x's statistics outside the vjp, JAX
# composes the full GroupNorm gradient automatically.
# ---------------------------------------------------------------------------


def _kernel_gn(x_hbm, a_ref, b_ref, w_ref, o_ref, acc_ref, xt_ref, sem, *, bh, width, w_halo, bc, feat, height):
    nc = pl.num_programs(2)
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

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

    # Normalize the tile in fp32 (GroupNorm32 numerics), cast to the compute
    # dtype, SiLU — then zero the conv's spatial padding: in the unfused path
    # padding is applied AFTER norm+act, so border zeros must stay zeros
    # (silu(b) otherwise). Channel padding needs no mask: padded a,b are 0 and
    # silu(0) = 0.
    # full-3D iota masks: Mosaic cannot reshape/broadcast an i1 (bh+2, w_halo)
    # mask up a minor dim ("Insertion of minor dim ... only for 32-bit types")
    tile_shape = (bh + 2, w_halo, bc)
    row = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0) + hi * bh
    col = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1)
    valid = (row >= 1) & (row <= height) & (col >= 1) & (col <= width)
    pre = xt_ref[:].astype(jnp.float32) * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    # silu in fp32 at the bf16-rounded point (Mosaic rejects bf16 logistic
    # lowering here; fp32 matches the unfused path to bf16 output rounding)
    act = pre.astype(xt_ref.dtype).astype(jnp.float32)
    act = act * jax.nn.sigmoid(act)
    xt_ref[:] = jnp.where(valid, act, 0.0).astype(xt_ref.dtype)

    for dy in range(3):
        for dx in range(3):
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


def _gn_conv_fwd(x: jax.Array, a: jax.Array, b: jax.Array, w: jax.Array) -> jax.Array:
    bsz, h, width, c = x.shape
    feat = w.shape[3]
    c_pad, f_pad = _round128(c), _round128(feat)
    # fp32 normalize temp lives alongside the tile: budget ~3x the bf16 tile
    w_halo = ((width + 2 + 7) // 8) * 8
    bh, bc = _pick_blocks(h, width, c_pad, f_pad, tile_mult=3)
    if bh == 0:
        raise ValueError(f"no VMEM-feasible block for shape {x.shape}->{feat}")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_halo - width - 1), (0, c_pad - c)))
    if c_pad != c:
        a = jnp.pad(a, ((0, 0), (0, c_pad - c)))
        b = jnp.pad(b, ((0, 0), (0, c_pad - c)))
    if (c_pad, f_pad) != (c, feat):
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c), (0, f_pad - feat)))
    grid = (bsz, h // bh, c_pad // bc)

    # a/b staged as (B, 8, C): Mosaic requires the block's sublane dim to be
    # a multiple of 8 (a (1, bc) block of a (B, C) array is rejected)
    a = jnp.broadcast_to(a[:, None, :].astype(jnp.float32), (bsz, 8, c_pad))
    b = jnp.broadcast_to(b[:, None, :].astype(jnp.float32), (bsz, 8, c_pad))
    a_spec = pl.BlockSpec((1, 8, bc), lambda bi, hi, ci: (bi, 0, ci))
    w_spec = pl.BlockSpec((3, 3, bc, f_pad), lambda bi, hi, ci: (0, 0, ci, 0))
    o_spec = pl.BlockSpec((1, bh, width, f_pad), lambda bi, hi, ci: (bi, hi, 0, 0))

    kernel = functools.partial(
        _kernel_gn, bh=bh, width=width, w_halo=w_halo, bc=bc, feat=f_pad, height=h
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), a_spec, a_spec, w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, f_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh * width, f_pad), jnp.float32),
            pltpu.VMEM((bh + 2, w_halo, bc), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * width * c * feat,
            bytes_accessed=2 * (bsz * h * width * (c + feat)) + 9 * c * feat * 2,
            transcendentals=bsz * h * width * c,
        ),
        interpret=_INTERPRET,
    )(xp, a, b, w)
    return out[..., :feat] if f_pad != feat else out


def _silu_at_rounded(pre: jax.Array, out_dtype) -> jax.Array:
    """fp32 SiLU evaluated at the out_dtype-rounded point — the exact op
    order the fused kernel uses (normalize fp32 → round → fp32 silu → round),
    shared by the XLA fallback and the bwd wgrad recompute so all three paths
    produce the same activation."""
    act = pre.astype(out_dtype).astype(jnp.float32)
    return (act * jax.nn.sigmoid(act)).astype(out_dtype)


def gn_silu_affine(x: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Unfused normalize+activate (fallback + parity oracle)."""
    pre = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    return _silu_at_rounded(pre, x.dtype)


@jax.custom_vjp
def gn_silu_conv3x3(x: jax.Array, a: jax.Array, b: jax.Array, w: jax.Array) -> jax.Array:
    """conv3x3(silu((x*a + b).astype(x.dtype)), w) with norm+act fused into
    the conv's VMEM tiles. a, b are per-(batch, channel) fp32 affines (the
    folded GroupNorm); grads wrt a, b compose with the stats chain outside."""
    return _gn_conv_fwd(x, a, b, w)


def _gn_vjp_fwd(x, a, b, w):
    return _gn_conv_fwd(x, a, b, w), (x, a, b, w)


def _gn_vjp_bwd(res, dy):
    x, a, b, w = res
    # recompute the activation chain from x (elementwise; XLA fuses it into
    # the surrounding passes — the fwd saved the write+read this costs)
    pre = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    y_act = _silu_at_rounded(pre, x.dtype)

    # dgrad: same dispatch as conv3x3's bwd
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    c_in = x.shape[-1]
    if c_in <= 1280 and c_in % 128 == 0 and w.shape[3] % 128 == 0 and not _INTERPRET:
        dact = _conv_fwd(dy, w_flip.astype(dy.dtype))
    else:
        dact = jax.lax.conv_general_dilated(
            dy,
            w_flip.astype(dy.dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # silu'(p) = sig(p) * (1 + p * (1 - sig(p))) in fp32, evaluated at the
    # SAME rounding point the fwd kernel uses (pre rounded to the storage
    # dtype before silu — see _silu_at_rounded); the unrounded pre would
    # differentiate a slightly different function in bf16
    pre_r = pre.astype(x.dtype).astype(jnp.float32)
    sig = jax.nn.sigmoid(pre_r)
    dpre = dact.astype(jnp.float32) * sig * (1.0 + pre_r * (1.0 - sig))
    dx = (dpre * a[:, None, None, :]).astype(x.dtype)
    da = jnp.sum(dpre * x.astype(jnp.float32), axis=(1, 2))
    db = jnp.sum(dpre, axis=(1, 2))

    # wgrad: one direct XLA conv on the recomputed activation (see _vjp_bwd)
    lhs = jnp.pad(y_act, ((0, 0), (1, 1), (1, 1), (0, 0))).transpose(3, 1, 2, 0)
    rhs = dy.transpose(1, 2, 0, 3)
    dw = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3)
    return dx, da.astype(a.dtype), db.astype(b.dtype), dw.astype(w.dtype)


gn_silu_conv3x3.defvjp(_gn_vjp_fwd, _gn_vjp_bwd)


def gn_silu_conv3x3_available() -> bool:
    """The fused kernel runs on TPU (or anywhere under the interpreter)."""
    return _INTERPRET or jax.default_backend() == "tpu"


def gn_silu_conv3x3_supported(x_shape, w_shape, stride, padding, dtype) -> bool:
    """conv3x3_supported + VMEM headroom for the in-kernel fp32 normalize."""
    if not conv3x3_supported(x_shape, w_shape, stride, padding, dtype):
        return False
    _b, h, width, c = x_shape
    return _pick_blocks(h, width, _round128(c), _round128(w_shape[3]), tile_mult=3)[0] > 0


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC (Pallas implicit GEMM)."""
    return _conv_fwd(x, w)


def _vjp_fwd(x, w):
    return _conv_fwd(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    # dgrad: stride-1 SAME conv of dy with the flipped, in/out-swapped filter.
    # A/B (tools/conv_bench.py): the Pallas dgrad wins when its accumulator
    # F (= x's C) stays ≤1280 and channels are lane-aligned; the 2560-concat
    # dgrad loses ~14% — keep XLA there.
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    c_in = x.shape[-1]
    f_out = w.shape[3]
    if c_in <= 1280 and c_in % 128 == 0 and f_out % 128 == 0:
        dx = _conv_fwd(dy, w_flip.astype(dy.dtype))
    else:
        dx = jax.lax.conv_general_dilated(
            dy,
            w_flip.astype(dy.dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # wgrad as ONE direct XLA conv (a jax.vjp of the fwd would re-run the
    # whole forward conv just to build the closure): slide dy (as the filter)
    # over the padded input with channels↔batch swapped —
    #   dw[ky,kx,c,f] = Σ_{b,i,j} x_pad[b,i+ky,j+kx,c] · dy[b,i,j,f]
    lhs = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).transpose(3, 1, 2, 0)  # (C, H+2, W+2, B)
    rhs = dy.transpose(1, 2, 0, 3)  # (H, W, B, F)
    dw = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,  # fp32 accumulate at bf16 MXU rate
    ).transpose(1, 2, 0, 3)  # (C, 3, 3, F) -> (3, 3, C, F)
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_vjp_fwd, _vjp_bwd)


def conv3x3_supported(x_shape, w_shape, stride, padding, dtype) -> bool:
    """Gate for layers.Conv2d: 3x3, stride 1, pad 1, bf16, MXU-worthy dims.

    Channels must be lane-aligned (128-multiples): the A/B shows the padded
    320-channel level loses ~7% to XLA, so it stays on the XLA emitter.

    Spatial extent is capped at the MEASURED win range (h·w ≤ 4096: the
    64²/32² UNet levels from tools/conv_bench.py). Above it the kernel LOSES
    big: the SDXL-VAE 1024px encode regressed 307 → 156 imgs/s when the
    kernel ran at 1024²-512² spatial — the explicit halo re-pad of multi-GB
    activations and the single-C-block accumulator shape don't amortize
    there; XLA's emitter keeps those levels."""
    if tuple(w_shape[:2]) != (3, 3) or stride != 1 or padding != 1:
        return False
    if dtype not in (jnp.bfloat16,):
        return False
    _b, h, width, c = x_shape
    feat = w_shape[3]
    if c < 128 or feat < 128 or not (1024 <= h * width <= 4096):
        return False
    if c % 128 or feat % 128:
        return False
    return _pick_blocks(h, width, c, feat)[0] > 0
