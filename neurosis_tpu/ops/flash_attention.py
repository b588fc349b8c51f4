"""Pallas TPU flash attention (non-causal, maskless) for diffusion transformers.

Replaces the reference's xformers/SDPA CUDA kernels (modules/attention.py:187-417)
on the hot path (§3.2: SpatialTransformer self/cross attention is the hottest op).

Shapes: q [B, H, Sq, D], k/v [B, H, Skv, D]. Diffusion specifics this kernel is
tuned for (unlike causal-LM flash kernels):
  - non-causal, no attention mask;
  - head dims 40/64/80/160 (SD1.5/SDXL) — D is zero-padded to a lane multiple
    in-kernel (zero K columns don't change q·kᵀ; zero V columns are sliced off);
  - Sq = h·w from aspect buckets (any multiple of 16) — q rows are padded and
    sliced, kv tail columns are masked inside the softmax.

Standard two-pass-free online softmax: grid (B, H, nq, nk), fp32 accumulators in
VMEM scratch, finalized on the last kv step. Backward = two kernels (dq and
dkv), recomputing p from saved row max/sum residuals.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
_LANES = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, m_scr, l_scr, *, scale, kv_len):
    """One (b, h, q_block, kv_block) step of online-softmax attention."""
    nk = pl.num_programs(3)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)

    # Mask kv tail padding (zero-padded K gives logits == 0, which would leak
    # into the softmax). Only the final block can contain padding.
    bk = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        m_ref[0, 0] = m_scr[:]
        l_ref[0, 0] = l_scr[:]


def _fwd(q, k, v, *, scale, block_q, block_k, kv_len):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nq = sq // block_q
    nk = skv // block_k

    grid = (b, h, nq, nk)
    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    o_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    stat_spec = pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
    )
    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(o_spec, stat_spec, stat_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=2 * (b * h * sq * d + 2 * b * h * skv * d),
            transcendentals=b * h * sq * skv,
        ),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref, dq_ref, acc_ref, *, scale, kv_len):
    nk = pl.num_programs(3)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]  # rowsum(do * o)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    bk = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - m) / l

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - di) * scale
    acc_ref[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, kv_len
):
    nq = pl.num_programs(3)
    qi = pl.program_id(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    # s transposed layout: (BK, BQ) so dk/dv contractions hit the MXU directly
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    bk = st.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + ki * bk
    st = jnp.where(row < kv_len, st, NEG_INF)
    pt = jnp.exp(st - m[:, 0][None, :]) / l[:, 0][None, :]  # (BK, BQ)

    dv_acc[:] += jax.lax.dot_general(pt, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dst = pt * (dpt - di[:, 0][None, :]) * scale  # (BK, BQ)
    dk_acc[:] += jax.lax.dot_general(dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, kv_len, res, do):
    q, k, v, o, m, l = res
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nq = sq // block_q
    nk = skv // block_k

    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    di = jnp.broadcast_to(di, (b, h, sq, _LANES))

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    stat_spec = pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len),
        grid=(b, h, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec, stat_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, m, l, di)

    # dkv: grid loops q blocks innermost, kv blocks as 3rd dim
    q_spec2 = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    kv_spec2 = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0))
    stat_spec2 = pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, ki, qi: (bi, hi, qi, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len),
        grid=(b, h, nk, nq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, stat_spec2, stat_spec2, stat_spec2],
        out_specs=(kv_spec2, kv_spec2),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, m, l, di)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, kv_len):
    o, _, _ = _fwd(q, k, v, scale=scale, block_q=block_q, block_k=block_k, kv_len=kv_len)
    return o


def _flash_fwd(q, k, v, scale, block_q, block_k, kv_len):
    o, m, l = _fwd(q, k, v, scale=scale, block_q=block_q, block_k=block_k, kv_len=kv_len)
    return o, (q, k, v, o, m, l)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Flash attention over [B, H, S, D]; pads S and D to hardware tiles."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)  # scale by TRUE head dim, before padding

    d_pad = _round_up(d, _LANES)
    block_q = min(block_q, _round_up(sq, 16))
    block_k = min(block_k, _round_up(skv, 16))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    qp = _pad_to(_pad_to(q, 3, d_pad), 2, sq_pad)
    kp = _pad_to(_pad_to(k, 3, d_pad), 2, skv_pad)
    vp = _pad_to(_pad_to(v, 3, d_pad), 2, skv_pad)

    o = _flash(qp, kp, vp, scale, block_q, block_k, skv)
    return o[:, :, :sq, :d]
