"""Pallas TPU flash attention (non-causal, maskless) for diffusion transformers.

Replaces the reference's xformers/SDPA CUDA kernels (modules/attention.py:187-417)
on the hot path (§3.2: SpatialTransformer self/cross attention is the hottest op).

Shapes: q [B, H, Sq, D], k/v [B, H, Skv, D]. Diffusion specifics this kernel is
tuned for (unlike causal-LM flash kernels):
  - non-causal, no attention mask;
  - head dims 40/64/80/160 (SD1.5/SDXL): D-MAJOR (transposed) layouts — blocks
    are (D, S) and logits are computed TRANSPOSED as st = kᵀ·q (BK, BQ), so
    every matmul contracts over D as the SUBLANE dim or over S at full
    128-lane width, and softmax statistics stay lane-oriented (1, BQ) with no
    in-kernel transposes. An (S, D=64) layout would pad D to 128 lanes and
    waste half the MXU;
  - Sq/Skv from aspect buckets: q tail padded+sliced, kv tail masked in-softmax.

Three kernel families share the math:
  - WIDE-ROW kernels for single-softmax-chunk rows (cross-attention skv ≤ 256
    and, with _WIDE_SELF, single-block self-attention skv ≤ 1024): one grid
    cell owns hg heads × the WHOLE q range, iterated as (head, q-chunk) steps
    with the next step's st matmul issued before this step's VPU work. These
    rows were 4-10x per-cell fixed cost on the per-q-block grid (r3c profile:
    cross-attention 8.3 → 4.9 ms/step of the SDXL step).
  - CHUNKED whole-row kernels (default wherever VMEM allows): one grid cell
    owns the full kv row (or q range for dkv) split into chunks, with chunk
    i+1's st matmul issued BEFORE chunk i's VPU softmax work — TPU matmuls
    retire through asynchronous queues, so the MXU overlaps the exp2 passes
    (+13% fwd+bwd at the SDXL level-1 shape, +31% at the VAE mid-attention;
    tools/chunked_ab.py). Online-softmax state lives in registers.
  - TWO-PASS grid kernels (fallback for VMEM-infeasible rows, e.g. 16k-token
    SD1.5 level 0): online softmax with fp32 accumulators in VMEM scratch,
    kv (or q) blocks iterated on an 'arbitrary' grid dim.
Statistics saved as LSE = m + log(l) for the two backward kernels (dq, dkv);
q is pre-scaled by scale·log2(e) outside the kernels (see _flash).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-head-dim (bq, bk) table from the round-3 on-chip sweep
# (tools/flash_sweep.py, v5e, bf16 fwd+bwd, scan-amortized, host-barrier
# timing). Winners per shape, TF/s in parentheses:
#   d=40  S=16384: 512/1024 (46.0) > 1024/1024 (44.9) > 512/512 (43.1)
#   d=64  S=4096:  512/1024 (49.9) ≈ 1024/1024 (49.3) > 512/512 (47.2)
#   d=80  S=4096:  512/2048 (61.6) > 1024/1024 (60.1) > 512/1024 (58.5)
#   d=160 S=4096:  1024/1024 (78.7) > 512/1024 (77.0) > 512/512 (71.9)
#   d=512 S=4096:  256/512 (68.2) > 512/512 (66.4); bigger blocks OOM VMEM
# Round-4 re-sweep of d=40 at the REAL sd15-l0 grid (b=4, h=8 — the r3 sweep's
# winner does not hold at production grids; tools/sd15_l0_probe.py):
#   512/4096 (52.6) ≈ 1024/2048 (52.5) > 512/2048 (50.7) > 1024/1024 (50.2)
#   > 512/1024 (46.6); */8192 and 1024/4096 OOM scoped VMEM.
#   Chunked small-bq variants all LOSE here (bq=256: 39.4, bq=128: 24.7).
_BLOCK_TABLE = {48: (512, 4096), 64: (512, 1024), 80: (512, 2048), 160: (1024, 1024)}
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_STAT_ROWS = 8  # fp32 min sublane tile for the (rows, S) stat arrays
NEG_INF = -1e30
LOG2_E = 1.4426950408889634


def _pick_blocks(d_pad: int) -> tuple:
    if d_pad in _BLOCK_TABLE:
        return _BLOCK_TABLE[d_pad]
    if d_pad >= 256:
        return (256, 512)  # VMEM-bound: d-major blocks are (d, S)
    return (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)


# Chunked whole-row kernels (issue-first MXU/VPU pipelining) are used when
# the working set fits VMEM; set NEUROSIS_FLASH_CHUNKED=0 to force the
# two-pass grid kernels everywhere (A/B escape hatch). The knob gates KERNEL
# DISPATCH only — block-size resolution keeps the round-2 short-seq whole-q
# bump (sq ≤ 1024) so CHUNKED=0 reproduces the round-2 baseline config.
_CHUNKED = os.environ.get("NEUROSIS_FLASH_CHUNKED", "1") != "0"
_CHUNK_VMEM_BUDGET = 15_500_000  # bytes; scoped VMEM limit is 16 MiB
# Split single-chunk rows (skv == block_k, e.g. the 1024-token SDXL level-2
# self-attention — 60 blocks, the largest in-situ attention bucket) into two
# chunks so the issue-first pipeline has something to overlap. Standalone
# benches are overhead-dominated at this shape; the step-level A/B measured
# 2.3335 vs 2.3242 steps/s (SDXL b2) — default ON.
_SPLIT_SHORT = os.environ.get("NEUROSIS_FLASH_SPLIT_SHORT", "1") != "0"
# Wide-row kernels for small-kv rows (cross-attention): one cell per
# (batch, head-group) instead of per (b, h, q-block) — the r3c profile shows
# cross-attention calls are 4-10x per-cell fixed cost. NEUROSIS_FLASH_WIDE=0
# restores the per-q-block grid.
_WIDE = os.environ.get("NEUROSIS_FLASH_WIDE", "1") != "0"
# Wide path for single-block SELF attention rows (skv ≤ 1024, e.g. the
# 1024-token SDXL level-2) — head-grouped cells with the whole kv row as ONE
# softmax chunk. Default ON: step-level A/B 2.3684 vs 2.360 steps/s (SDXL b2).
_WIDE_SELF = os.environ.get("NEUROSIS_FLASH_WIDE_SELF", "1") != "0"
# STREAMED whole-row kernels for rows where the unrolled chunked pipeline is
# VMEM-infeasible (16k-token SD1.5 level 0): same issue-first math, but the
# in-flight st (and bwd dpt) tiles are staged through a fori_loop-bounded
# VMEM scratch double-buffer, so the footprint is independent of row length.
# DEFAULT OFF — a MEASURED NULL (round 4, tools/streamed_probe.py, real
# sd15-l0 grid b4/h8/16k/d40, ABAB same-window): streamed 40.2 TF/s fwd+bwd
# (fwd-only a wash: 48.5 vs 48.9) vs two-pass 52.4. The issue-first overlap
# does not materialize through scratch refs or loop carries; the r3 chunked
# wins came from fewer grid cells at SHORT rows, which 16k rows don't need.
_STREAMED = os.environ.get("NEUROSIS_FLASH_STREAMED", "0") != "0"
# SUB-CHUNKED two-pass kernels: split each (BK, BQ) logit tile into an
# unrolled issue-first sub-chunk pipeline inside the cell. DEFAULT OFF —
# also a MEASURED NULL at the same grid (51.8 vs 52.4 TF/s mono; the dq/dkv
# blocks must halve to fit Mosaic's per-unroll stack allocation, giving the
# win back). Kept as an A/B escape hatch with the VMEM model calibrated
# against the measured 19.91 MB dkv overrun.
_SUBCHUNK = os.environ.get("NEUROSIS_FLASH_SUBCHUNK", "0") != "0"
# Head-group candidates for the wide-row kernels, largest first. Must divide
# h to be used; non-power-of-2 divisors matter for h=20 (SDXL level-2: hg=5
# would give 4 cells/batch-elem instead of 5 on an overhead-bound path) —
# sweepable via the env list before changing the default.
_WIDE_HG = tuple(
    int(x) for x in os.environ.get("NEUROSIS_FLASH_WIDE_HG", "8,4,2,1").split(",")
)


def _two_pass_cfg(kind: str, block: int, bq: int) -> tuple:
    """(block, n_sub) for a two-pass kernel cell.

    Sub-chunking unrolls the logit tile into ~1024-row issue-first pieces;
    Mosaic's stack allocator allocates per UNROLLED iteration and reuses only
    ~60%, so the cap is cumulative bytes over the whole block — measured:
    the dkv cell at block 4096 × bq 512 (16 B/logit: st4 + dpt4 + pt4+2 +
    dst2) allocates 19.91 MB against the 16 MB limit, while the fwd cell
    (10 B/logit: st4 + pt4+2) compiles. Kernels whose table block busts the
    cap get the block halved once (more grid steps, smaller tiles) before
    giving up on sub-chunking."""
    if not (_CHUNKED and _SUBCHUNK):
        return block, 1
    bpl = {"fwd": 10, "dq": 14, "dkv": 16}[kind]
    for blk in (block, block // 2):
        n = max(1, blk // 1024)
        while blk % n:
            n -= 1
        if n > 1 and bpl * blk * bq * 0.6 <= _CHUNK_VMEM_BUDGET:
            return blk, n
    return block, 1


def _pick_chunk(d: int, skv: int, block_k: int) -> int:
    if _SPLIT_SHORT and skv == block_k and skv >= 512 and d <= 160:
        return skv // 2
    return block_k


def _chunked_feasible(
    d: int,
    bq: int,
    s_whole: int,
    chunk: int,
    itemsize: int,
    bwd: bool = False,
    grid_cells: int = 1,
) -> bool:
    """Empirical VMEM estimate for a whole-row chunked kernel cell: one live
    fp32 (chunk, bq) st tile + one fp32+bf16 pt tile + the whole-kv (or
    whole-q) operands + the q/o tiles, PLUS a cumulative-unroll cap — Mosaic's
    stack allocator reuses only ~half the unrolled st tiles across chunks.
    The bwd kernels additionally hold a fp32 dpt tile, a bf16 dst tile, and
    the do/d-output tiles. Calibrated against the measured boundary
    (tools/overlap_bench.py + tools/chunked_ab.py: chunk=1024/bq=1024/
    skv=4096/d=64 compiles and is the fastest config; bq=2048 variants and
    S=16384·bq=512 OOM the 16 MiB scoped VMEM).

    `grid_cells` is the TOTAL grid size of the would-be kernel: Mosaic's
    scoped-VMEM use grows with it (measured: the same fwd config modeled at
    11.6 MB compiled at training grids ≤160 cells but allocated 16.86 MB —
    1.45x — at the sample-b4 CFG grid (8,10,4)=320 cells). Large grids get
    the measured 1.45x margin so infeasible configs FALL BACK to the two-pass
    kernels instead of dying in the compiler."""
    # cumulative cap: TOTAL fp32 st footprint (4·s_whole·bq over all chunks)
    # must stay under ~20 MB — 16.8 MB compiles, 29-33 MB OOMs
    if 4 * s_whole * bq > 20_000_000:
        return False
    whole = 2 * d * s_whole * itemsize
    st = 4 * chunk * bq
    pt = (4 + itemsize) * chunk * bq
    qo = d * bq * (itemsize + 4)
    use = whole + st + pt + qo
    if bwd:
        use += (4 + itemsize) * chunk * bq  # dpt fp32 + dst bf16
        use += 2 * d * bq * itemsize  # do tile + d-output tile
    if grid_cells > 160:
        use = int(use * 1.45)
    return use <= _CHUNK_VMEM_BUDGET


def _streamed_cfg(
    d: int,
    bq: int,
    s_whole: int,
    itemsize: int,
    bwd: bool = False,
    stats_whole: bool = False,
    grid_cells: int = 1,
) -> int | None:
    """Chunk size for a STREAMED whole-row kernel cell, or None if even the
    smallest chunk busts VMEM. Unlike _chunked_feasible there is no cumulative
    unroll cap: the in-flight st (and bwd dpt) tiles live in two explicit
    scratch buffers, so the footprint is the whole-row operands + 2 (fwd) or
    4 (bwd) fp32 (chunk, bq) scratch tiles + one live pt/dst temporary set.
    Larger chunks amortize the MXU/VPU handoff better, so the largest
    feasible divisor chunk wins. `stats_whole` adds the whole-row lse/di
    operands (the dkv cell). Large grids get the measured 1.45x Mosaic
    scoped-VMEM margin (see _chunked_feasible)."""
    if not (_CHUNKED and _STREAMED):
        return None
    for chunk in (2048, 1024, 512, 256):
        if chunk > s_whole or s_whole % chunk:
            continue
        if s_whole // chunk < 2 or (s_whole // chunk) % 2:
            # single chunk: the plain chunked kernel handles it; odd counts
            # don't fit the kernels' 2x-unrolled pipeline
            continue
        whole = 2 * d * s_whole * itemsize
        if stats_whole:
            whole += 2 * _STAT_ROWS * s_whole * 4
        scr = (4 if bwd else 2) * 4 * chunk * bq
        temps = (4 + itemsize) * chunk * bq  # pt fp32 + bf16 copy
        if bwd:
            temps += (4 + itemsize) * chunk * bq  # dpt consume + dst bf16
        qo = d * bq * (itemsize + 4)
        if bwd:
            qo += 2 * d * bq * itemsize  # do tile + d-output tile
        use = whole + scr + temps + qo
        if grid_cells > 160:
            use = int(use * 1.45)
        if use <= _CHUNK_VMEM_BUDGET:
            return chunk
    return None


def _resolve_blocks(d_pad: int, sq: int, skv: int, block_q: int, block_k: int,
                    itemsize: int = 2) -> tuple:
    """Table blocks clipped to the (padded) sequence lengths.

    Block bump: when the whole-kv chunked kernel is feasible, q blocks grow
    to min(1024, sq) for d ≤ 160 — fewer, fatter grid cells measured +8% on
    top of the chunked pipeline at the SDXL level-1 shape
    (tools/overlap_bench.py chunk4-bq1024 60.1 vs chunk4x1024-bq512 55.7).
    For sq ≤ 1024 the whole q range is ONE block (the in-situ profile shows
    short-seq attention is bound by per-grid-cell overhead)."""
    tq, tk = _pick_blocks(d_pad)
    from_table = block_q == 0
    block_q = block_q or tq
    block_k = block_k or tk
    sq_aligned = _round_up(sq, 128)
    if from_table and d_pad <= 160:
        # largest q block ≤ 1024 that DIVIDES the padded length — a
        # non-divisor bump (e.g. 1024 at sq_aligned=2560) would pad ~20%
        # dead q rows for aspect-bucket shapes
        bq_big = max(c for c in range(128, 1025, 128) if sq_aligned % c == 0)
        if bq_big > block_q:
            kb = min(block_k, _round_up(skv, 128))
            if not _CHUNKED:
                # round-2 baseline: whole-q single block for short rows only
                if sq_aligned <= 1024:
                    block_q = bq_big
            elif _chunked_feasible(d_pad, bq_big, _round_up(skv, kb), kb, itemsize):
                block_q = bq_big
    block_q = min(block_q, sq_aligned)
    block_k = min(block_k, _round_up(skv, 128))
    return block_q, block_k


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_scr, l_scr, *,
                kv_len, n_sub=1):
    """One (b, h, q_block, kv_block) step; tensor blocks (D, S), logits (BK, BQ).

    n_sub > 1 splits the kv block into an UNROLLED issue-first sub-chunk
    pipeline (see _fwd_chunked_kernel) — the per-cell m/l/acc scratch still
    carries online-softmax state across grid steps, but within a cell the
    MXU executes sub-chunk i+1's st underneath sub-chunk i's exp2. This is
    the long-row configuration (16k-token SD1.5 level 0) where the whole-row
    chunked kernel is VMEM-infeasible and the monolithic (BK, BQ) tile of
    the plain two-pass kernel serializes MXU and VPU."""
    nk = pl.num_programs(3)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # feed bf16 straight to the MXU (fp32 accumulate via preferred_element_type);
    # an explicit astype(f32) here forces fp32-rate matmuls — measured 2.9x
    # slower at 4096 tokens (25.8 vs 75.9 TF/s fwd+bwd)
    qt = q_ref[0, 0]  # (D, BQ)
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]  # (D, BK)
    bk = kt.shape[1] // n_sub

    # st[k, q] in BASE-2 log space — contract D over sublanes, BQ at full
    # lane width. q arrives PRE-SCALED by scale·log2(e) (one fused XLA pass in
    # _flash_fwd), so both transcendentals are raw exp2 (the VPU primitive)
    # with ZERO in-kernel scale work: no (BK, BQ) logit rescale pass and no
    # VPU dependency ahead of the first MXU op of the cell (an in-kernel
    # q-rescale measured -14% at the 1024-token shape — it serializes the
    # matmul issue behind the VPU).
    m = m_scr[0:1, :]  # (1, BQ), base-2
    l = l_scr[0:1, :]
    o = acc_ref[:]
    st = [None] * n_sub
    st[0] = _dg(kt[:, :bk], qt, ((0,), (0,)))  # (BK, BQ)
    for i in range(n_sub):
        if i + 1 < n_sub:
            st[i + 1] = _dg(kt[:, (i + 1) * bk : (i + 2) * bk], qt, ((0,), (0,)))
        st_i = st[i]
        st[i] = None
        if kv_len is not None:  # None → kv tile-aligned, mask statically elided
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + ki * n_sub * bk + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(st_i, axis=0, keepdims=True))  # (1, BQ)
        alpha = jnp.exp2(m - m_new)  # (1, BQ)
        pt = jnp.exp2(st_i - m_new)  # (BK, BQ)
        l = alpha * l + jnp.sum(pt, axis=0, keepdims=True)
        # o^T (D, BQ) += v^T (D, BK) @ p^T (BK, BQ) — contract BK
        o = o * alpha + _dg(vt[:, i * bk : (i + 1) * bk], pt.astype(vt.dtype), ((1,), (0,)))
        m = m_new

    acc_ref[:] = o
    m_scr[:] = jnp.broadcast_to(m, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        lf = l_scr[0:1, :]
        o_ref[0, 0] = (acc_ref[:] / lf).astype(o_ref.dtype)
        # lse reported in NATURAL log — the bwd kernels are base-e
        lse = m_scr[0:1, :] * (1.0 / LOG2_E) + jnp.log(jnp.maximum(lf, 1e-30))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd_chunked_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, n_chunks, kv_len):
    """Whole-kv-row forward: one grid cell sees the full softmax row, split
    into n_chunks kv sub-tiles processed as a software pipeline — chunk i+1's
    st matmul is ISSUED before chunk i's VPU softmax work, so the MXU (whose
    ops retire through asynchronous queues) executes st_{i+1} underneath
    exp2(st_i). The measured effect at the SDXL level-1 shape is +28% over
    the two-pass grid kernel (tools/overlap_bench.py: 60.1 vs 46.8 TF/s fwd,
    chunk=1024/bq=1024); with n_chunks == 1 this reduces to the scratch-free
    one-pass kernel (the overhead-minimal path for cross-attention and the
    1024-token level). Online rescale state lives in registers, not scratch."""
    qt = q_ref[0, 0]  # (D, BQ)
    kt = k_ref[0, 0]  # (D, SKV)
    vt = v_ref[0, 0]  # (D, SKV)
    bk = kt.shape[1] // n_chunks

    st = [None] * n_chunks
    st[0] = _dg(kt[:, :bk], qt, ((0,), (0,)))  # (BK, BQ), base-2 (q pre-scaled)
    m = l = o = None
    for i in range(n_chunks):
        if i + 1 < n_chunks:
            st[i + 1] = _dg(kt[:, (i + 1) * bk : (i + 2) * bk], qt, ((0,), (0,)))
        st_i = st[i]
        st[i] = None  # drop the Python reference once consumed
        if kv_len is not None and (i + 1) * bk > kv_len:
            # tail mask only on chunks that actually straddle kv_len — fully
            # interior chunks skip the iota+select statically
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        m_i = jnp.max(st_i, axis=0, keepdims=True)  # (1, BQ)
        m_new = m_i if m is None else jnp.maximum(m, m_i)
        pt = jnp.exp2(st_i - m_new)
        l_i = jnp.sum(pt, axis=0, keepdims=True)
        o_i = _dg(vt[:, i * bk : (i + 1) * bk], pt.astype(vt.dtype), ((1,), (0,)))
        if m is None:
            m, l, o = m_new, l_i, o_i
        else:
            alpha = jnp.exp2(m - m_new)  # (1, BQ)
            l = l * alpha + l_i
            o = o * alpha + o_i
            m = m_new
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse = m * (1.0 / LOG2_E) + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd_streamed_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, st_scr, *, n_chunks, kv_len):
    """STREAMED whole-kv-row forward for rows where the unrolled chunked
    pipeline is VMEM-infeasible (16k-token SD1.5 level 0): the chunk loop is
    a lax.fori_loop whose body Mosaic allocates ONCE — the unrolled variant's
    per-iteration st/pt stack tiles are what OOM'd scoped VMEM at long rows
    (measured 28.6 MB at S=16384/bq=512 even with st in scratch). The
    issue-first schedule survives as an explicit 2x-unrolled software
    pipeline with STATIC buffer indices — a (i+1)%2 dynamic index would make
    the scratch write and read potentially aliasing to the compiler, which
    serializes the MXU behind the VPU (measured 33.4 vs 52.4 TF/s two-pass).
    Each fori_loop trip handles chunks 2t (buf0) and 2t+1 (buf1): buf1's st
    is issued before buf0's VPU phase, buf0's NEXT st before buf1's VPU
    phase. Online rescale state rides the loop carry. n_chunks must be even
    (_streamed_cfg guarantees it)."""
    qt = q_ref[0, 0]  # (D, BQ)
    d, bq = qt.shape
    skv = k_ref.shape[3]
    bk = skv // n_chunks

    def _issue(i, buf):
        kc = k_ref[0, 0, :, pl.ds(i * bk, bk)]  # (D, BK)
        st_scr[buf] = _dg(kc, qt, ((0,), (0,)))  # (BK, BQ), base-2 (q pre-scaled)

    def _consume(i, st_i, carry):
        m, l, o = carry
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        m_i = jnp.max(st_i, axis=0, keepdims=True)  # (1, BQ)
        m_new = jnp.maximum(m, m_i)
        pt = jnp.exp2(st_i - m_new)
        l_i = jnp.sum(pt, axis=0, keepdims=True)
        vc = v_ref[0, 0, :, pl.ds(i * bk, bk)]
        o_i = _dg(vc, pt.astype(v_ref.dtype), ((1,), (0,)))  # (D, BQ)
        alpha = jnp.exp2(m - m_new)
        return m_new, l * alpha + l_i, o * alpha + o_i

    _issue(0, 0)

    def body(t, carry):
        i = 2 * t
        _issue(i + 1, 1)
        carry = _consume(i, st_scr[0], carry)

        @pl.when(i + 2 < n_chunks)
        def _():
            _issue(i + 2, 0)

        return _consume(i + 1, st_scr[1], carry)

    carry = (
        jnp.full((1, bq), NEG_INF, jnp.float32),
        jnp.zeros((1, bq), jnp.float32),
        jnp.zeros((d, bq), jnp.float32),
    )
    m, l, o = jax.lax.fori_loop(0, n_chunks // 2, body, carry)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse = m * (1.0 / LOG2_E) + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _bwd_dq_streamed_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                            st_scr, dpt_scr, *, n_chunks, scale, kv_len):
    """STREAMED whole-kv dq (see _fwd_streamed_kernel): 2x-unrolled fori_loop
    with static scratch indices; st AND dpt staged through double-buffers —
    both of a chunk's independent matmuls are issued before its VPU phase
    (dpt depends only on the resident v/do, not on pt). dq accumulator rides
    the loop carry."""
    qt = q_ref[0, 0]  # (D, BQ)
    dot = do_ref[0, 0]  # (D, BQ)
    lse2 = lse_ref[0, 0][0:1, :] * LOG2_E  # (1, BQ), base-2
    di = di_ref[0, 0][0:1, :]  # (1, BQ)
    d, bq = qt.shape
    skv = k_ref.shape[3]
    bk = skv // n_chunks

    def _issue(i, buf):
        kc = k_ref[0, 0, :, pl.ds(i * bk, bk)]
        vc = v_ref[0, 0, :, pl.ds(i * bk, bk)]
        st_scr[buf] = _dg(kc, qt, ((0,), (0,)))  # (BK, BQ); q pre-scaled
        dpt_scr[buf] = _dg(vc, dot, ((0,), (0,)))  # (BK, BQ)

    def _consume(i, st_i, dpt, acc):
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        pt = jnp.exp2(st_i - lse2)
        dst = (pt * (dpt - di)).astype(q_ref.dtype)  # unscaled
        kc = k_ref[0, 0, :, pl.ds(i * bk, bk)]
        return acc + _dg(kc, dst, ((1,), (0,)))  # (D, BQ)

    _issue(0, 0)

    def body(t, acc):
        i = 2 * t
        _issue(i + 1, 1)
        acc = _consume(i, st_scr[0], dpt_scr[0], acc)

        @pl.when(i + 2 < n_chunks)
        def _():
            _issue(i + 2, 0)

        return _consume(i + 1, st_scr[1], dpt_scr[1], acc)

    acc = jax.lax.fori_loop(0, n_chunks // 2, body, jnp.zeros((d, bq), jnp.float32))
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_streamed_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
                             st_scr, dpt_scr, *, n_chunks, kv_len):
    """STREAMED whole-q dk/dv (see _fwd_streamed_kernel): one grid cell owns
    a kv block and the FULL q range as a 2x-unrolled fori_loop over q chunks
    with static scratch indices, st/dpt staged through double-buffers, dk/dv
    accumulators in the carry."""
    ki = pl.program_id(2)
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]  # (D, BK)
    d, bk = kt.shape
    sq = q_ref.shape[3]
    cq = sq // n_chunks

    def _issue(j, buf):
        qc = q_ref[0, 0, :, pl.ds(j * cq, cq)]
        dc = do_ref[0, 0, :, pl.ds(j * cq, cq)]
        st_scr[buf] = _dg(kt, qc, ((0,), (0,)))  # (BK, CQ); q pre-scaled
        dpt_scr[buf] = _dg(vt, dc, ((0,), (0,)))  # (BK, CQ)

    def _consume(j, st_j, dpt, carry):
        dk, dv = carry
        lse2 = lse_ref[0, 0, 0:1, pl.ds(j * cq, cq)] * LOG2_E
        di_j = di_ref[0, 0, 0:1, pl.ds(j * cq, cq)]
        pt = jnp.exp2(st_j - lse2)
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, pt.shape, 0) + ki * bk
            pt = jnp.where(row < kv_len, pt, 0.0)
        dc = do_ref[0, 0, :, pl.ds(j * cq, cq)]
        # dv^T (D, BK) += do^T (D, CQ) @ p (CQ, BK) — contract CQ (pt lanes)
        dv_c = _dg(dc, pt.astype(do_ref.dtype), ((1,), (1,)))
        dst = (pt * (dpt - di_j)).astype(q_ref.dtype)
        qc = q_ref[0, 0, :, pl.ds(j * cq, cq)]
        # dk^T (D, BK) += q^T (D, CQ) @ ds (CQ, BK) — contract CQ
        dk_c = _dg(qc, dst, ((1,), (1,)))
        return dk + dk_c, dv + dv_c

    _issue(0, 0)

    def body(t, carry):
        j = 2 * t
        _issue(j + 1, 1)
        carry = _consume(j, st_scr[0], dpt_scr[0], carry)

        @pl.when(j + 2 < n_chunks)
        def _():
            _issue(j + 2, 0)

        return _consume(j + 1, st_scr[1], dpt_scr[1], carry)

    carry = (jnp.zeros((d, bk), jnp.float32), jnp.zeros((d, bk), jnp.float32))
    dk, dv = jax.lax.fori_loop(0, n_chunks // 2, body, carry)
    # dk = q·dsᵀ·scale with q = q̃/(scale·log2e) ⇒ dk = q̃·dsᵀ/log2e
    dk_ref[0, 0] = (dk * (1.0 / LOG2_E)).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _fwd_wide_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, hg, n_cq, kv_len):
    """Wide-row forward for SMALL kv (cross-attention: skv_pad ≤ 256 fits one
    chunk, so there is no online-softmax state at all): one grid cell owns hg
    heads × the WHOLE q range, iterated as hg·n_cq (head, q-chunk) steps with
    the next step's st matmul issued before this step's VPU softmax — the
    per-call picture for cross-attention is 60–320 near-empty cells whose
    fixed cost is 4–10× the useful work (r3c profile: 8.3 ms/step of sdpa
    time holds ~1% of the flops)."""
    sq = q_ref.shape[3]
    cq = sq // n_cq
    skv = k_ref.shape[3]
    steps = [(g, j) for g in range(hg) for j in range(n_cq)]

    def _issue(idx):
        g, j = steps[idx]
        return _dg(k_ref[0, g], q_ref[0, g][:, j * cq : (j + 1) * cq], ((0,), (0,)))

    st_next = _issue(0)
    for i, (g, j) in enumerate(steps):
        st_i = st_next
        if i + 1 < len(steps):
            st_next = _issue(i + 1)
        if kv_len is not None and skv > kv_len:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0)
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        m = jnp.max(st_i, axis=0, keepdims=True)  # (1, CQ)
        pt = jnp.exp2(st_i - m)
        l = jnp.sum(pt, axis=0, keepdims=True)
        o = _dg(v_ref[0, g], pt.astype(v_ref.dtype), ((1,), (0,)))  # (D, CQ)
        o_ref[0, g, :, j * cq : (j + 1) * cq] = (o / l).astype(o_ref.dtype)
        lse = m * (1.0 / LOG2_E) + jnp.log(jnp.maximum(l, 1e-30))
        lse_ref[0, g, :, j * cq : (j + 1) * cq] = jnp.broadcast_to(
            lse, (lse_ref.shape[2], cq)
        )


def _wide_cfg(b: int, h: int, d: int, sq: int, skv: int, bwd: bool = False):
    """(hg, n_cq) for the wide-row small-kv path, or None if infeasible.

    Targets ≥2 pipeline steps and ~4096 q positions per cell; VMEM per cell is
    hg whole-row q/o(/do/dq) operands + two in-flight (skv, cq) fp32 st tiles
    (+ dpt in bwd)."""
    max_kv = 1024 if _WIDE_SELF else 256
    if not _WIDE or not _CHUNKED or skv > max_kv or sq < 512 or d > 160:
        return None
    # bigger kv rows hold (skv, cq) fp32 st/dpt tiles — halve the q chunk
    cq = min(1024 if skv <= 256 else 512, sq)
    if sq % cq:
        return None
    n_cq = sq // cq
    tiles = (3 if bwd else 2) * skv * cq * 4 + skv * cq * 2
    per_head = d * sq * (2 + 2 + (4 if bwd else 0))  # q + o (+ do/dq bf16 ≈ 4B)
    per_head += (2 if bwd else 1) * _STAT_ROWS * sq * 4  # fp32 lse (+ di)
    per_head += 2 * d * skv * 2  # k + v
    # Mosaic's stack allocator reuses unrolled temporaries imperfectly: the
    # measured bwd footprint at (hg=4, d=160, skv=1024, cq=512) was 19.83 MB
    # vs this model's 15.4 — calibrate bwd by that 1.3x overrun (the estimate
    # sat 0.5% under budget and OOM'd the SD1.5-b8 compile)
    use_scale = 1.3 if bwd else 1.0
    # largest head group that meets the work cap AND the VMEM budget (retry
    # smaller groups rather than falling back to the per-q-block grid)
    for hg in _WIDE_HG:
        if h % hg or hg * sq > 8192:
            continue
        if hg * n_cq < 2:
            continue
        if (hg * per_head + tiles) * use_scale <= _CHUNK_VMEM_BUDGET:
            return hg, n_cq
    return None


def _fwd(qt, kt, vt, *, block_q, block_k, kv_len):
    b, h, d, sq = qt.shape
    skv = kt.shape[3]
    grid = (b, h, sq // block_q, skv // block_k)

    wide = _wide_cfg(b, h, d, sq, skv)
    if wide is not None:
        hg, n_cq = wide
        q_spec = pl.BlockSpec((1, hg, d, sq), lambda bi, hi: (bi, hi, 0, 0))
        kv_spec = pl.BlockSpec((1, hg, d, skv), lambda bi, hi: (bi, hi, 0, 0))
        lse_spec = pl.BlockSpec((1, hg, _STAT_ROWS, sq), lambda bi, hi: (bi, hi, 0, 0))
        return pl.pallas_call(
            functools.partial(_fwd_wide_kernel, hg=hg, n_cq=n_cq, kv_len=kv_len),
            grid=(b, h // hg),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=(q_spec, lse_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, d, sq), qt.dtype),
                jax.ShapeDtypeStruct((b, h, _STAT_ROWS, sq), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq * skv * d,
                bytes_accessed=2 * (b * h * sq * d + 2 * b * h * skv * d),
                transcendentals=b * h * sq * skv,
            ),
        )(qt, kt, vt)

    chunk = _pick_chunk(d, skv, block_k)
    grid_cells = b * h * (sq // block_q)
    scratch = None
    if _CHUNKED and _chunked_feasible(
        d, block_q, skv, chunk, qt.dtype.itemsize, grid_cells=grid_cells,
    ):
        pass  # unrolled chunked pipeline, no scratch
    else:
        chunk = _streamed_cfg(d, block_q, skv, qt.dtype.itemsize, grid_cells=grid_cells)
        if chunk is not None:
            scratch = [pltpu.VMEM((2, chunk, block_q), jnp.float32)]
    if _CHUNKED and chunk is not None:
        # whole kv row per cell, chunked issue-first pipeline (fori_loop
        # streamed variant when the unrolled one is VMEM-infeasible)
        kern = _fwd_streamed_kernel if scratch else _fwd_chunked_kernel
        q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
        kv_spec = pl.BlockSpec((1, 1, d, skv), lambda bi, hi, qi: (bi, hi, 0, 0))
        lse_spec = pl.BlockSpec((1, 1, _STAT_ROWS, block_q), lambda bi, hi, qi: (bi, hi, 0, qi))
        return pl.pallas_call(
            functools.partial(kern, n_chunks=skv // chunk, kv_len=kv_len),
            grid=grid[:3],
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=(q_spec, lse_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, d, sq), qt.dtype),
                jax.ShapeDtypeStruct((b, h, _STAT_ROWS, sq), jnp.float32),
            ),
            scratch_shapes=scratch or [],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq * skv * d,
                bytes_accessed=2 * (b * h * sq * d + 2 * b * h * skv * d),
                transcendentals=b * h * sq * skv,
            ),
        )(qt, kt, vt)

    bk_tp, n_sub = _two_pass_cfg("fwd", block_k, block_q)
    q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi))
    kv_spec = pl.BlockSpec((1, 1, d, bk_tp), lambda bi, hi, qi, ki: (bi, hi, 0, ki))
    lse_spec = pl.BlockSpec((1, 1, _STAT_ROWS, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi))

    out_shapes = (
        jax.ShapeDtypeStruct((b, h, d, sq), qt.dtype),
        jax.ShapeDtypeStruct((b, h, _STAT_ROWS, sq), jnp.float32),
    )
    kernel = functools.partial(_fwd_kernel, kv_len=kv_len, n_sub=n_sub)
    return pl.pallas_call(
        kernel,
        grid=(b, h, sq // block_q, skv // bk_tp),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((d, block_q), jnp.float32),
            pltpu.VMEM((_STAT_ROWS, block_q), jnp.float32),
            pltpu.VMEM((_STAT_ROWS, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=2 * (b * h * sq * d + 2 * b * h * skv * d),
            transcendentals=b * h * sq * skv,
        ),
    )(qt, kt, vt)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, acc_ref, *,
                   scale, kv_len, n_sub=1):
    """Two-pass dq; n_sub > 1 runs the kv block as an unrolled issue-first
    sub-chunk pipeline (see _fwd_kernel) — st AND dpt for sub-chunk i+1 are
    issued before sub-chunk i's VPU phase (dpt depends only on v/do)."""
    nk = pl.num_programs(3)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # operands stay in their storage dtype (bf16 in training) — explicit
    # fp32 casts force fp32-rate MXU passes (measured 2.9x slower in fwd);
    # accumulation is fp32 via preferred_element_type in _dg
    qt = q_ref[0, 0]  # (D, BQ)
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]  # (D, BK)
    dot = do_ref[0, 0]  # (D, BQ)
    lse = lse_ref[0, 0][0:1, :]  # (1, BQ)
    di = di_ref[0, 0][0:1, :]  # (1, BQ)
    bk = kt.shape[1] // n_sub

    # base-2 recompute: p = exp(s - lse) = exp2(s·log2e - lse·log2e); the
    # row-wise lse rescale is BQ muls vs the BK·BQ muls exp would lower to.
    # q arrives pre-scaled by scale·log2e (see _flash_fwd); dst's *scale is
    # deferred to the (D, BQ) finalize — no full-logit-tile rescale passes
    def _issue_st(i):
        return _dg(kt[:, i * bk : (i + 1) * bk], qt, ((0,), (0,)))  # (BK, BQ)

    def _issue_dpt(i):
        return _dg(vt[:, i * bk : (i + 1) * bk], dot, ((0,), (0,)))  # v·do over D

    # n_sub == 1 keeps the original op order (dpt AFTER the exp2 pass, so st
    # is dead before dpt lives — the monolithic 4096-block cell is VMEM-tight);
    # sub-chunked cells issue st+dpt for chunk i+1 before chunk i's VPU phase
    sub = [None] * n_sub
    sub[0] = (_issue_st(0), _issue_dpt(0) if n_sub > 1 else None)
    acc = acc_ref[:]
    for i in range(n_sub):
        if i + 1 < n_sub:
            sub[i + 1] = (_issue_st(i + 1), _issue_dpt(i + 1))
        st_i, dpt = sub[i]
        sub[i] = None
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + ki * n_sub * bk + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        pt = jnp.exp2(st_i - lse * LOG2_E)  # (BK, BQ)
        if dpt is None:
            dpt = _issue_dpt(i)
        dst = (pt * (dpt - di)).astype(kt.dtype)  # (BK, BQ), unscaled
        # dq^T (D, BQ) += k^T (D, BK) @ ds^T (BK, BQ) — contract BK
        acc = acc + _dg(kt[:, i * bk : (i + 1) * bk], dst, ((1,), (0,)))
    acc_ref[:] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dq_chunked_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                           *, n_chunks, scale, kv_len):
    """Whole-kv dq: one grid cell owns a q block and the FULL kv row, split
    into n_chunks sub-tiles pipelined issue-first (see _fwd_chunked_kernel).
    No accumulator scratch — the running dq lives in registers."""
    qt = q_ref[0, 0]  # (D, BQ)
    kt = k_ref[0, 0]  # (D, SKV)
    vt = v_ref[0, 0]  # (D, SKV)
    dot = do_ref[0, 0]  # (D, BQ)
    lse2 = lse_ref[0, 0][0:1, :] * LOG2_E  # (1, BQ), base-2
    di = di_ref[0, 0][0:1, :]  # (1, BQ)
    bk = kt.shape[1] // n_chunks

    st = [None] * n_chunks
    st[0] = _dg(kt[:, :bk], qt, ((0,), (0,)))  # (BK, BQ); q pre-scaled
    acc = None
    for i in range(n_chunks):
        if i + 1 < n_chunks:
            st[i + 1] = _dg(kt[:, (i + 1) * bk : (i + 2) * bk], qt, ((0,), (0,)))
        st_i = st[i]
        st[i] = None
        if kv_len is not None and (i + 1) * bk > kv_len:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + i * bk
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        pt = jnp.exp2(st_i - lse2)
        dpt = _dg(vt[:, i * bk : (i + 1) * bk], dot, ((0,), (0,)))  # (BK, BQ)
        dst = (pt * (dpt - di)).astype(kt.dtype)  # unscaled
        contrib = _dg(kt[:, i * bk : (i + 1) * bk], dst, ((1,), (0,)))  # (D, BQ)
        acc = contrib if acc is None else acc + contrib
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dq_wide_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                        *, hg, n_cq, scale, kv_len):
    """Wide-row small-kv dq: one cell per (b, head-group) × whole q, iterated
    as hg·n_cq steps with the next st issued before this step's VPU work
    (see _fwd_wide_kernel)."""
    sq = q_ref.shape[3]
    cq = sq // n_cq
    skv = k_ref.shape[3]
    steps = [(g, j) for g in range(hg) for j in range(n_cq)]

    def _issue(idx):
        g, j = steps[idx]
        return _dg(k_ref[0, g], q_ref[0, g][:, j * cq : (j + 1) * cq], ((0,), (0,)))

    st_next = _issue(0)
    for i, (g, j) in enumerate(steps):
        st_i = st_next
        if i + 1 < len(steps):
            st_next = _issue(i + 1)
        if kv_len is not None and skv > kv_len:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0)
            st_i = jnp.where(row < kv_len, st_i, NEG_INF)
        lse2 = lse_ref[0, g][0:1, j * cq : (j + 1) * cq] * LOG2_E
        di = di_ref[0, g][0:1, j * cq : (j + 1) * cq]
        pt = jnp.exp2(st_i - lse2)  # (SKV, CQ)
        dot_j = do_ref[0, g][:, j * cq : (j + 1) * cq]
        dpt = _dg(v_ref[0, g], dot_j, ((0,), (0,)))  # (SKV, CQ)
        dst = (pt * (dpt - di)).astype(k_ref.dtype)
        dq = _dg(k_ref[0, g], dst, ((1,), (0,)))  # (D, CQ)
        dq_ref[0, g, :, j * cq : (j + 1) * cq] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_chunked_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
                            *, n_chunks, kv_len):
    """Whole-q dk/dv: one grid cell owns a kv block and the FULL q range,
    split into n_chunks q sub-tiles pipelined issue-first. Register-carried
    dk/dv accumulators, direct write."""
    ki = pl.program_id(2)
    qt = q_ref[0, 0]  # (D, SQ)
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]  # (D, BK)
    dot = do_ref[0, 0]  # (D, SQ)
    lse2 = lse_ref[0, 0][0:1, :] * LOG2_E  # (1, SQ)
    di_all = di_ref[0, 0][0:1, :]  # (1, SQ)
    cq = qt.shape[1] // n_chunks

    st = [None] * n_chunks
    st[0] = _dg(kt, qt[:, :cq], ((0,), (0,)))  # (BK, CQ); q pre-scaled
    dk = dv = None
    for j in range(n_chunks):
        if j + 1 < n_chunks:
            st[j + 1] = _dg(kt, qt[:, (j + 1) * cq : (j + 2) * cq], ((0,), (0,)))
        st_j = st[j]
        st[j] = None
        pt = jnp.exp2(st_j - lse2[:, j * cq : (j + 1) * cq])
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, pt.shape, 0) + ki * kt.shape[1]
            pt = jnp.where(row < kv_len, pt, 0.0)
        dot_j = dot[:, j * cq : (j + 1) * cq]
        # dv^T (D, BK) += do^T (D, CQ) @ p (CQ, BK) — contract CQ (pt lanes)
        dv_c = _dg(dot_j, pt.astype(dot.dtype), ((1,), (1,)))
        dpt = _dg(vt, dot_j, ((0,), (0,)))  # (BK, CQ)
        dst = (pt * (dpt - di_all[:, j * cq : (j + 1) * cq])).astype(qt.dtype)
        # dk^T (D, BK) += q^T (D, CQ) @ ds (CQ, BK) — contract CQ
        dk_c = _dg(qt[:, j * cq : (j + 1) * cq], dst, ((1,), (1,)))
        dk = dk_c if dk is None else dk + dk_c
        dv = dv_c if dv is None else dv + dv_c
    # dk = q·dsᵀ·scale with q = q̃/(scale·log2e) ⇒ dk = q̃·dsᵀ/log2e
    dk_ref[0, 0] = (dk * (1.0 / LOG2_E)).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dkv_wide_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
                         *, hg, n_cq, kv_len):
    """Wide-row small-kv dk/dv: one cell per (b, head-group), whole q per head
    chunked issue-first; register-carried per-head dk/dv accumulators."""
    sq = q_ref.shape[3]
    cq = sq // n_cq
    skv = k_ref.shape[3]
    steps = [(g, j) for g in range(hg) for j in range(n_cq)]

    def _issue(idx):
        g, j = steps[idx]
        return _dg(k_ref[0, g], q_ref[0, g][:, j * cq : (j + 1) * cq], ((0,), (0,)))

    st_next = _issue(0)
    dk = dv = None
    for i, (g, j) in enumerate(steps):
        st_j = st_next
        if i + 1 < len(steps):
            st_next = _issue(i + 1)
        lse2 = lse_ref[0, g][0:1, j * cq : (j + 1) * cq] * LOG2_E
        pt = jnp.exp2(st_j - lse2)  # (SKV, CQ)
        if kv_len is not None and skv > kv_len:
            row = jax.lax.broadcasted_iota(jnp.int32, pt.shape, 0)
            pt = jnp.where(row < kv_len, pt, 0.0)
        dot_j = do_ref[0, g][:, j * cq : (j + 1) * cq]
        dv_c = _dg(dot_j, pt.astype(do_ref.dtype), ((1,), (1,)))  # (D, SKV)
        dpt = _dg(v_ref[0, g], dot_j, ((0,), (0,)))  # (SKV, CQ)
        di = di_ref[0, g][0:1, j * cq : (j + 1) * cq]
        dst = (pt * (dpt - di)).astype(q_ref.dtype)
        dk_c = _dg(q_ref[0, g][:, j * cq : (j + 1) * cq], dst, ((1,), (1,)))  # (D, SKV)
        dk = dk_c if j == 0 else dk + dk_c
        dv = dv_c if j == 0 else dv + dv_c
        if j == n_cq - 1:
            dk_ref[0, g] = (dk * (1.0 / LOG2_E)).astype(dk_ref.dtype)
            dv_ref[0, g] = dv.astype(dv_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    *, kv_len, n_sub=1):
    """Two-pass dk/dv; n_sub > 1 splits the KV block into an unrolled
    issue-first sub-chunk pipeline (see _fwd_kernel) with per-sub-chunk
    slices of the dk/dv accumulators."""
    nq = pl.num_programs(3)
    qi = pl.program_id(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qt = q_ref[0, 0]  # (D, BQ)
    kt = k_ref[0, 0]  # (D, BK)
    vt = v_ref[0, 0]  # (D, BK)
    dot = do_ref[0, 0]  # (D, BQ)
    lse = lse_ref[0, 0][0:1, :]  # (1, BQ)
    di = di_ref[0, 0][0:1, :]  # (1, BQ)
    bk = kt.shape[1] // n_sub

    # n_sub == 1 keeps the original op order (dpt after the dv update, when
    # st/pt pressure has receded — the monolithic 4096-block cell compiles at
    # the edge of scoped VMEM); sub-chunked cells issue dpt at the TOP of the
    # consume phase so it overlaps the exp2 pass it is independent of.
    st = [None] * n_sub
    st[0] = _dg(kt[:, :bk], qt, ((0,), (0,)))  # (BK, BQ)
    for i in range(n_sub):
        if i + 1 < n_sub:
            st[i + 1] = _dg(kt[:, (i + 1) * bk : (i + 2) * bk], qt, ((0,), (0,)))
        st_i = st[i]
        st[i] = None
        dpt = None
        if n_sub > 1:
            dpt = _dg(vt[:, i * bk : (i + 1) * bk], dot, ((0,), (0,)))  # (BK, BQ)
        pt = jnp.exp2(st_i - lse * LOG2_E)
        if kv_len is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, st_i.shape, 0) + ki * n_sub * bk + i * bk
            pt = jnp.where(row < kv_len, pt, 0.0)
        sl = slice(i * bk, (i + 1) * bk)
        # dv^T (D, BK) += do^T (D, BQ) @ p (BQ, BK) — contract BQ (pt lanes)
        dv_acc[:, sl] += _dg(dot, pt.astype(dot.dtype), ((1,), (1,)))
        if dpt is None:
            dpt = _dg(vt[:, i * bk : (i + 1) * bk], dot, ((0,), (0,)))
        dst = (pt * (dpt - di)).astype(qt.dtype)  # (BK, BQ), unscaled
        # dk^T (D, BK) += q^T (D, BQ) @ ds (BQ, BK) — contract BQ
        dk_acc[:, sl] += _dg(qt, dst, ((1,), (1,)))

    @pl.when(qi == nq - 1)
    def _finalize():
        # dk = q·dsᵀ·scale with q = q̃/(scale·log2e) ⇒ dk = q̃·dsᵀ/log2e
        dk_ref[0, 0] = (dk_acc[:] * (1.0 / LOG2_E)).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


# Declare CostEstimates on the backward kernels so XLA cost_analysis counts
# the attention bwd flops (it otherwise counts custom calls at 0). The
# estimates also feed XLA's latency-hiding scheduler — an interleaved
# same-window A/B measured them SPEED-NEUTRAL (cost 2.3424/2.3455 vs plain
# 2.3435/2.3420 steps/s on the SDXL b2 step; an earlier apparent -1.2% was
# chip-state drift between measurement windows). NEUROSIS_FLASH_COST_EST=0
# removes them.
_COST_EST = os.environ.get("NEUROSIS_FLASH_COST_EST", "1") != "0"


def _bwd_cost(b, h, sq, skv, d, matmuls):
    """CostEstimate for a backward kernel: `matmuls` logit-sized passes
    (dq: st+dpt+dq = 3, dkv: st+dpt+dv+dk = 4) + one exp2 pass."""
    if not _COST_EST:
        return None
    return pl.CostEstimate(
        flops=2 * matmuls * b * h * sq * skv * d,
        bytes_accessed=2 * (2 * b * h * sq * d + 2 * b * h * skv * d),
        transcendentals=b * h * sq * skv,
    )


def _bwd(scale, block_q, block_k, kv_len, res, do):
    qt, kt, vt, ot, lse = res
    b, h, d, sq = qt.shape
    skv = kt.shape[3]
    dot = do  # (B, H, D, Sq) — cotangent already D-major from the wrapper

    # di = rowsum(do * o) per q position — (B, H, 1, Sq) broadcast to stat rows
    di = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32), axis=2, keepdims=True)
    di = jnp.broadcast_to(di, (b, h, _STAT_ROWS, sq))

    # dq: q blocks halved for the chunked whole-kv path — it keeps two fp32
    # st tiles AND a dpt tile live per chunk, so bq=512 is the VMEM sweet
    # spot (the extra (BK, BQ) dpt tile is what the fwd kernel doesn't have)
    wide = _wide_cfg(b, h, d, sq, skv, bwd=True)
    if wide is not None:
        # both wide bwd kernels share the cell layout: (b, head-group) grid,
        # whole-row blocks
        hg, n_cq = wide
        q_specw = pl.BlockSpec((1, hg, d, sq), lambda bi, hi: (bi, hi, 0, 0))
        kv_specw = pl.BlockSpec((1, hg, d, skv), lambda bi, hi: (bi, hi, 0, 0))
        stat_specw = pl.BlockSpec((1, hg, _STAT_ROWS, sq), lambda bi, hi: (bi, hi, 0, 0))
        in_specsw = [q_specw, kv_specw, kv_specw, q_specw, stat_specw, stat_specw]
        paramsw = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_wide_kernel, hg=hg, n_cq=n_cq, scale=scale, kv_len=kv_len
            ),
            grid=(b, h // hg),
            in_specs=in_specsw,
            out_specs=q_specw,
            out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            compiler_params=paramsw,
            cost_estimate=_bwd_cost(b, h, sq, skv, d, 3),
        )(qt, kt, vt, dot, lse, di)
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_wide_kernel, hg=hg, n_cq=n_cq, kv_len=kv_len),
            grid=(b, h // hg),
            in_specs=in_specsw,
            out_specs=(kv_specw, kv_specw),
            out_shape=(
                jax.ShapeDtypeStruct(kt.shape, kt.dtype),
                jax.ShapeDtypeStruct(vt.shape, vt.dtype),
            ),
            compiler_params=paramsw,
            cost_estimate=_bwd_cost(b, h, sq, skv, d, 4),
        )(qt, kt, vt, dot, lse, di)
        return dq, dk, dv

    bq_dq = min(block_q, 512) if sq % min(block_q, 512) == 0 else block_q
    chunk = _pick_chunk(d, skv, block_k)
    scratch_dq = None
    if _CHUNKED and _chunked_feasible(
        d, bq_dq, skv, chunk, qt.dtype.itemsize, bwd=True,
        grid_cells=b * h * (sq // bq_dq),
    ):
        pass  # unrolled chunked pipeline, no scratch
    else:
        chunk = _streamed_cfg(
            d, bq_dq, skv, qt.dtype.itemsize, bwd=True,
            grid_cells=b * h * (sq // bq_dq),
        )
        if chunk is not None:
            scratch_dq = [
                pltpu.VMEM((2, chunk, bq_dq), jnp.float32),  # st
                pltpu.VMEM((2, chunk, bq_dq), jnp.float32),  # dpt
            ]
    if _CHUNKED and chunk is not None:
        kern_dq = _bwd_dq_streamed_kernel if scratch_dq else _bwd_dq_chunked_kernel
        q_spec1 = pl.BlockSpec((1, 1, d, bq_dq), lambda bi, hi, qi: (bi, hi, 0, qi))
        kv_spec1 = pl.BlockSpec((1, 1, d, skv), lambda bi, hi, qi: (bi, hi, 0, 0))
        stat_spec1 = pl.BlockSpec((1, 1, _STAT_ROWS, bq_dq), lambda bi, hi, qi: (bi, hi, 0, qi))
        dq = pl.pallas_call(
            functools.partial(
                kern_dq, n_chunks=skv // chunk, scale=scale, kv_len=kv_len
            ),
            grid=(b, h, sq // bq_dq),
            in_specs=[q_spec1, kv_spec1, kv_spec1, q_spec1, stat_spec1, stat_spec1],
            out_specs=q_spec1,
            out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            scratch_shapes=scratch_dq or [],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            cost_estimate=_bwd_cost(b, h, sq, skv, d, 3),
        )(qt, kt, vt, dot, lse, di)
    else:
        bk_tp, n_sub = _two_pass_cfg("dq", block_k, block_q)
        q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi))
        kv_spec = pl.BlockSpec((1, 1, d, bk_tp), lambda bi, hi, qi, ki: (bi, hi, 0, ki))
        stat_spec = pl.BlockSpec(
            (1, 1, _STAT_ROWS, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)
        )
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, scale=scale, kv_len=kv_len, n_sub=n_sub
            ),
            grid=(b, h, sq // block_q, skv // bk_tp),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            scratch_shapes=[pltpu.VMEM((d, block_q), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=_bwd_cost(b, h, sq, skv, d, 3),
        )(qt, kt, vt, dot, lse, di)

    # dkv: whole-q chunked path — one cell per kv block, q pipelined in
    # cq-sized chunks (same VMEM shape as dq with q/kv roles swapped).
    # Feasibility in the KERNEL'S OWN terms: the per-cell output block is the
    # (D, block_k) kv tile (the model's `bq` role) and the pipelined chunk is
    # cq over the whole-q row (`s_whole`=sq) — the whole-q q/do operands are
    # then the model's 2·d·s_whole resident term.
    cq = min(block_q, 512) if sq % min(block_q, 512) == 0 else block_q
    bk_dkv = block_k
    scratch_dkv = None
    if _CHUNKED and _chunked_feasible(
        d, block_k, sq, cq, qt.dtype.itemsize, bwd=True,
        grid_cells=b * h * (skv // block_k),
    ):
        pass  # unrolled chunked pipeline, no scratch
    else:
        # streamed dkv: the 4 fp32 (BK, CQ) scratch tiles scale with the kv
        # block, so shrink it below the table block_k until a q chunk fits
        cq = None
        for bk_c in (1024, 512, 256):
            if bk_c > skv or skv % bk_c:
                continue
            cq = _streamed_cfg(
                d, bk_c, sq, qt.dtype.itemsize, bwd=True, stats_whole=True,
                grid_cells=b * h * (skv // bk_c),
            )
            if cq is not None:
                bk_dkv = bk_c
                scratch_dkv = [
                    pltpu.VMEM((2, bk_c, cq), jnp.float32),  # st
                    pltpu.VMEM((2, bk_c, cq), jnp.float32),  # dpt
                ]
                break
    if _CHUNKED and cq is not None:
        kern_dkv = _bwd_dkv_streamed_kernel if scratch_dkv else _bwd_dkv_chunked_kernel
        q_spec3 = pl.BlockSpec((1, 1, d, sq), lambda bi, hi, ki: (bi, hi, 0, 0))
        kv_spec3 = pl.BlockSpec((1, 1, d, bk_dkv), lambda bi, hi, ki: (bi, hi, 0, ki))
        stat_spec3 = pl.BlockSpec((1, 1, _STAT_ROWS, sq), lambda bi, hi, ki: (bi, hi, 0, 0))
        dk, dv = pl.pallas_call(
            functools.partial(kern_dkv, n_chunks=sq // cq, kv_len=kv_len),
            grid=(b, h, skv // bk_dkv),
            in_specs=[q_spec3, kv_spec3, kv_spec3, q_spec3, stat_spec3, stat_spec3],
            out_specs=(kv_spec3, kv_spec3),
            out_shape=(
                jax.ShapeDtypeStruct(kt.shape, kt.dtype),
                jax.ShapeDtypeStruct(vt.shape, vt.dtype),
            ),
            scratch_shapes=scratch_dkv or [],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            cost_estimate=_bwd_cost(b, h, sq, skv, d, 4),
        )(qt, kt, vt, dot, lse, di)
        return dq, dk, dv

    bk_tp2, n_sub2 = _two_pass_cfg("dkv", block_k, block_q)
    q_spec2 = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, ki, qi: (bi, hi, 0, qi))
    kv_spec2 = pl.BlockSpec((1, 1, d, bk_tp2), lambda bi, hi, ki, qi: (bi, hi, 0, ki))
    stat_spec2 = pl.BlockSpec((1, 1, _STAT_ROWS, block_q), lambda bi, hi, ki, qi: (bi, hi, 0, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, kv_len=kv_len, n_sub=n_sub2),
        grid=(b, h, skv // bk_tp2, sq // block_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, stat_spec2, stat_spec2],
        out_specs=(kv_spec2, kv_spec2),
        out_shape=(
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),
            jax.ShapeDtypeStruct(vt.shape, vt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, bk_tp2), jnp.float32),
            pltpu.VMEM((d, bk_tp2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=_bwd_cost(b, h, sq, skv, d, 4),
    )(qt, kt, vt, dot, lse, di)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(qt, kt, vt, scale, block_q, block_k, kv_len):
    # q is pre-scaled by scale·log2(e) HERE, as one XLA elementwise pass that
    # fuses with the surrounding formatting ops — the kernels then work in
    # base-2 log space with zero per-cell scale work (see _fwd_kernel note)
    qs = (qt * (scale * LOG2_E)).astype(qt.dtype)
    o, _ = _fwd(qs, kt, vt, block_q=block_q, block_k=block_k, kv_len=kv_len)
    return o


def _flash_fwd(qt, kt, vt, scale, block_q, block_k, kv_len):
    qs = (qt * (scale * LOG2_E)).astype(qt.dtype)
    o, lse = _fwd(qs, kt, vt, block_q=block_q, block_k=block_k, kv_len=kv_len)
    # Name BOTH bwd residuals so the "names" remat policy
    # (save_only_these_names) can keep them and skip re-running this fwd
    # kernel in the bwd remat pass. Naming only the output is not enough:
    # an unsaved lse forces the whole fwd kernel to be rematerialized just
    # to regenerate it (verified at jaxpr level).
    o = jax.ad_checkpoint.checkpoint_name(o, "attn_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "attn_lse")
    # residual q is the PRE-SCALED q̃ — the bwd kernels recompute base-2
    # logits from it directly and emit dq w.r.t. the ORIGINAL q (·scale) and
    # dk w.r.t. k (·1/log2e), so no outer chain-rule pass is needed
    return o, (qs, kt, vt, o, lse)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 0,
    block_k: int = 0,
) -> jax.Array:
    """Flash attention over [B, H, S, D]; D-major internally, pads S/D to tiles.

    block_q/block_k = 0 → the per-head-dim sweep table (_BLOCK_TABLE)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)  # scale by TRUE head dim, before padding

    d_pad = _round_up(d, 16)  # sublane tile (bf16); multiple of 8 for fp32 too
    block_q, block_k = _resolve_blocks(d_pad, sq, skv, block_q, block_k, q.dtype.itemsize)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    # transpose to D-major (B, H, D, S) and pad
    qt = _pad_to(_pad_to(q.swapaxes(2, 3), 2, d_pad), 3, sq_pad)
    kt = _pad_to(_pad_to(k.swapaxes(2, 3), 2, d_pad), 3, skv_pad)
    vt = _pad_to(_pad_to(v.swapaxes(2, 3), 2, d_pad), 3, skv_pad)

    # kv_len=None statically elides the in-softmax tail mask (iota+select per
    # logit cell) — every self-attention shape is tile-aligned
    ot = _flash(qt, kt, vt, scale, block_q, block_k, None if skv == skv_pad else skv)
    return ot[:, :, :d, :sq].swapaxes(2, 3)


def flash_attention_dmajor(
    qt: jax.Array,
    kt: jax.Array,
    vt: jax.Array,
    block_q: int = 0,
    block_k: int = 0,
) -> jax.Array:
    """Flash attention over D-major [B, H, D, S] tensors, returning D-major.

    The zero-transpose entry: callers that PRODUCE q/k/v in the kernel's
    native layout (projection einsums emitting bhds — modules/attention.py
    folded path, +3.4% on the block per tools/transpose_fold_bench.py) skip
    the (B,H,S,D)↔(B,H,D,S) shuffles entirely."""
    b, h, d, sq = qt.shape
    skv = kt.shape[3]
    scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, 16)
    block_q, block_k = _resolve_blocks(d_pad, sq, skv, block_q, block_k, qt.dtype.itemsize)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    qt = _pad_to(_pad_to(qt, 2, d_pad), 3, sq_pad)
    kt = _pad_to(_pad_to(kt, 2, d_pad), 3, skv_pad)
    vt = _pad_to(_pad_to(vt, 2, d_pad), 3, skv_pad)

    ot = _flash(qt, kt, vt, scale, block_q, block_k, None if skv == skv_pad else skv)
    return ot[:, :, :d, :sq]
