"""Experiment: softmax-exp / MXU overlap inside the flash forward kernel.

Hypothesis (NOTES round-3 candidate): at d=64 the fwd kernel alternates
MXU (st, pv) and VPU (max/exp2/sum) phases serially. TPU matmuls issue
through asynchronous queues, so splitting the kv block in two and issuing
chunk B's st matmul BEFORE chunk A's VPU softmax work should let the MXU
execute st_b while the VPU runs exp2(st_a), and pv_a while exp2(st_b) runs.

Variants (fwd only, scan-amortized, host-barrier timed):
  base      — library one-pass / two-pass kernels as shipped
  split2    — one grid cell, kv processed as 2 halves, online rescale,
              matmul-issue-first instruction order
"""
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

_cache = os.path.expanduser("~/.cache/neurosis_tpu_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurosis_tpu.ops.flash_attention import LOG2_E, _dg, _fwd

_STAT_ROWS = 8


def _split2_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
    qt = q_ref[0, 0]  # (D, BQ), pre-scaled by scale·log2e
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]
    bk = kt.shape[1] // 2

    # chunk A matmul, then chunk B matmul issued BEFORE chunk A's VPU work:
    # if MXU queues are asynchronous, st_b executes under exp2(st_a)
    st_a = _dg(kt[:, :bk], qt, ((0,), (0,)))  # (BK/2, BQ)  MXU
    st_b = _dg(kt[:, bk:], qt, ((0,), (0,)))  # (BK/2, BQ)  MXU (independent)

    m_a = jnp.max(st_a, axis=0, keepdims=True)  # VPU
    pt_a = jnp.exp2(st_a - m_a)
    l_a = jnp.sum(pt_a, axis=0, keepdims=True)
    o_a = _dg(vt[:, :bk], pt_a.astype(vt.dtype), ((1,), (0,)))  # MXU ∥ next VPU?

    m_b = jnp.max(st_b, axis=0, keepdims=True)  # VPU
    m = jnp.maximum(m_a, m_b)
    alpha_a = jnp.exp2(m_a - m)
    pt_b = jnp.exp2(st_b - m)
    l = l_a * alpha_a + jnp.sum(pt_b, axis=0, keepdims=True)
    o_b = _dg(vt[:, bk:], pt_b.astype(vt.dtype), ((1,), (0,)))  # MXU

    o = (o_a * alpha_a + o_b) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse = m * (1.0 / LOG2_E) + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, n_chunks):
    """General n-chunk software pipeline: issue chunk i+1's st matmul before
    chunk i's VPU softmax work; online rescale carried in registers."""
    qt = q_ref[0, 0]  # (D, BQ), pre-scaled
    kt = k_ref[0, 0]  # (D, SKV)
    vt = v_ref[0, 0]
    bk = kt.shape[1] // n_chunks

    st = [None] * n_chunks
    st[0] = _dg(kt[:, :bk], qt, ((0,), (0,)))
    m = l = o = None
    for i in range(n_chunks):
        if i + 1 < n_chunks:
            st[i + 1] = _dg(kt[:, (i + 1) * bk : (i + 2) * bk], qt, ((0,), (0,)))
        m_i = jnp.max(st[i], axis=0, keepdims=True)
        if m is None:
            m_new = m_i
        else:
            m_new = jnp.maximum(m, m_i)
        pt = jnp.exp2(st[i] - m_new)
        l_i = jnp.sum(pt, axis=0, keepdims=True)
        o_i = _dg(vt[:, i * bk : (i + 1) * bk], pt.astype(vt.dtype), ((1,), (0,)))
        if m is None:
            m, l, o = m_new, l_i, o_i
        else:
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + l_i
            o = o * alpha + o_i
            m = m_new
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse = m * (1.0 / LOG2_E) + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def chunked_fwd(q, k, v, block_q, n_chunks):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    qt = (q.swapaxes(2, 3) * (scale * LOG2_E)).astype(q.dtype)
    kt = k.swapaxes(2, 3)
    vt = v.swapaxes(2, 3)
    q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
    kv_spec = pl.BlockSpec((1, 1, d, skv), lambda bi, hi, qi: (bi, hi, 0, 0))
    lse_spec = pl.BlockSpec((1, 1, _STAT_ROWS, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
    o, _ = pl.pallas_call(
        functools.partial(_chunked_kernel, n_chunks=n_chunks),
        grid=(b, h, sq // block_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct((b, h, _STAT_ROWS, sq), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qt, kt, vt)
    return o.swapaxes(2, 3)


def split2_fwd(q, k, v, block_q):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    qt = (q.swapaxes(2, 3) * (scale * LOG2_E)).astype(q.dtype)
    kt = k.swapaxes(2, 3)
    vt = v.swapaxes(2, 3)
    q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
    kv_spec = pl.BlockSpec((1, 1, d, skv), lambda bi, hi, qi: (bi, hi, 0, 0))
    lse_spec = pl.BlockSpec((1, 1, _STAT_ROWS, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
    o, _ = pl.pallas_call(
        _split2_kernel,
        grid=(b, h, sq // block_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct((b, h, _STAT_ROWS, sq), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qt, kt, vt)
    return o.swapaxes(2, 3)


def base_fwd(q, k, v, block_q, block_k):
    scale = 1.0 / math.sqrt(q.shape[-1])
    qs = (q.swapaxes(2, 3) * (scale * LOG2_E)).astype(q.dtype)
    o, _ = _fwd(
        qs, k.swapaxes(2, 3), v.swapaxes(2, 3),
        block_q=block_q, block_k=block_k, kv_len=None,
    )
    return o.swapaxes(2, 3)


def bench(fn, sq, skv, d, batch, heads, iters=50):
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, skv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, skv, d), jnp.bfloat16)

    @jax.jit
    def loop(q, k, v):
        def body(carry, _):
            o = fn(carry, k, v)
            return carry + (o * 1e-30).astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(loop(q, k, v))
    t0 = time.perf_counter()
    _ = float(loop(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    return 4 * batch * heads * sq * skv * d / dt / 1e12, dt * 1e6


def check(fn_a, fn_b, sq, skv, d, batch, heads):
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, skv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, skv, d), jnp.bfloat16)
    a = jax.jit(fn_a)(q, k, v).astype(jnp.float32)
    b = jax.jit(fn_b)(q, k, v).astype(jnp.float32)
    return float(jnp.max(jnp.abs(a - b)))


if __name__ == "__main__":
    cases = [
        # (label, fn, sq, skv, b, h)
        ("l2-1024 base(onepass)", lambda q, k, v: base_fwd(q, k, v, 1024, 1024), 1024, 1024, 2, 20),
        ("l2-1024 split2", lambda q, k, v: split2_fwd(q, k, v, 1024), 1024, 1024, 2, 20),
        ("l1-4096 base(512/1024)", lambda q, k, v: base_fwd(q, k, v, 512, 1024), 4096, 4096, 2, 10),
        ("l1-4096 split2(bk=4096→2x2048)", lambda q, k, v: split2_fwd(q, k, v, 512), 4096, 4096, 2, 10),
        ("l2-1024 chunk2", lambda q, k, v: chunked_fwd(q, k, v, 1024, 2), 1024, 1024, 2, 20),
        ("l2-1024 chunk4", lambda q, k, v: chunked_fwd(q, k, v, 1024, 4), 1024, 1024, 2, 20),
        ("l1-4096 chunk4x1024", lambda q, k, v: chunked_fwd(q, k, v, 512, 4), 4096, 4096, 2, 10),
        ("l1-4096 chunk8x512", lambda q, k, v: chunked_fwd(q, k, v, 512, 8), 4096, 4096, 2, 10),
        ("l1-4096 chunk4-bq1024", lambda q, k, v: chunked_fwd(q, k, v, 1024, 4), 4096, 4096, 2, 10),
        ("l1-4096 chunk8-bq1024", lambda q, k, v: chunked_fwd(q, k, v, 1024, 8), 4096, 4096, 2, 10),
        ("l1-4096 chunk16-bq1024", lambda q, k, v: chunked_fwd(q, k, v, 1024, 16), 4096, 4096, 2, 10),
        ("l1-4096 chunk8-bq2048", lambda q, k, v: chunked_fwd(q, k, v, 2048, 8), 4096, 4096, 2, 10),
        ("l2-1024 chunk8", lambda q, k, v: chunked_fwd(q, k, v, 1024, 8), 1024, 1024, 2, 20),
        ("x77 chunk1-bq1024", lambda q, k, v: chunked_fwd(q, k, v, 1024, 1), 1024, 128, 2, 20),
    ]
    err = check(cases[0][1], cases[1][1], 1024, 1024, 64, 1, 2)
    print(json.dumps({"check_maxabs_l2": err}), flush=True)
    for label, fn, sq, skv, b, h in cases:
        try:
            tf, us = bench(fn, sq, skv, 64, b, h)
        except Exception as e:  # VMEM OOM etc. — report and continue the sweep
            print(json.dumps({"case": label, "error": str(e)[:120]}), flush=True)
            continue
        print(json.dumps({"case": label, "tf_s": round(tf, 2), "us_per_call": round(us, 1)}), flush=True)
