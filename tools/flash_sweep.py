"""Per-head-dim flash-attention block sweep on the real TPU (VERDICT r2 #6).

Round 2 tuned (bq, bk) only at the SDXL shape (d=64, S=4096). SD1.5 runs
d=40/80/160 and its 1024px level-0 sees S=16384; the VAE mid-attention is a
single d=512 head. This sweep measures fwd+bwd TF/s per (d, S, bq, bk) and
prints a JSON table to drive the per-d defaults in ops/flash_attention.py.

Run on-chip:  python tools/flash_sweep.py   (background; ~30-60 min of compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: repeated sweeps skip the slow remote compiles
_cache = __import__('os').path.expanduser('~/.cache/neurosis_tpu_xla')
__import__('os').makedirs(_cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

from neurosis_tpu.ops.flash_attention import flash_attention

# (d, seq) shapes that actually occur: SDXL 64/4096&1024, SD1.5 40/16384,
# 80/4096, 160/1024&4096, VAE 512/4096 (64px latent) — S=16384 for 1024px SD1.5
SHAPES = [
    (64, 4096),
    (40, 16384),
    (80, 4096),
    (160, 4096),
    (160, 1024),
    (512, 4096),
]
BLOCKS = [(256, 512), (512, 512), (512, 1024), (1024, 1024), (512, 2048), (256, 1024)]
VMEM_BUDGET = 100 * 1024 * 1024  # v5e VMEM 128MB; leave headroom


def vmem_bytes(d_pad, bq, bk):
    # q/k/v/do blocks bf16 + acc/stat scratch f32 (fwd + the larger bwd dkv)
    blocks = 2 * (d_pad * bq * 2 + 2 * d_pad * bk * 2)  # double-buffered in/out
    scratch = d_pad * max(bq, bk) * 4 * 2 + 4 * 8 * bq * 4
    return blocks + scratch


def bench_one(d, s, bq, bk, batch=2, heads=8, iters=20):
    if d >= 256:
        heads = 1
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, s, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=bq, block_k=bk).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step_n(q, k, v):
        def body(carry, _):
            qc, acc = carry
            g = grad(qc, k, v)
            # hoist-proof: feed the grad back into q
            qn = qc + (g[0] * 1e-30).astype(qc.dtype)
            return (qn, acc + jnp.sum(g[1].astype(jnp.float32))), None

        (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=iters)
        return acc + jnp.sum(qf.astype(jnp.float32))

    # completion barrier on the remote-attached TPU: a HOST TRANSFER —
    # block_until_ready returns at dispatch there (bench.py:157-161 note)
    _ = float(step_n(q, k, v))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(step_n(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    # fwd 4*b*h*s^2*d, bwd ~2.5x fwd (dq + dkv each recompute logits)
    flops = 3.5 * 4 * batch * heads * s * s * d
    return flops / dt / 1e12


def main():
    results = {}
    for d, s in SHAPES:
        d_pad = ((d + 15) // 16) * 16
        for bq, bk in BLOCKS:
            if bq > s or bk > s:
                continue
            if vmem_bytes(d_pad, bq, bk) > VMEM_BUDGET:
                results[f"d{d}_s{s}_bq{bq}_bk{bk}"] = "skip_vmem"
                continue
            try:
                tf = bench_one(d, s, bq, bk)
                results[f"d{d}_s{s}_bq{bq}_bk{bk}"] = round(tf, 2)
            except Exception as e:  # noqa: BLE001
                results[f"d{d}_s{s}_bq{bq}_bk{bk}"] = f"err:{type(e).__name__}"
            print(json.dumps({"last": list(results.items())[-1]}), flush=True)
    print(json.dumps({"device": str(jax.devices()[0]), "results": results}, indent=1))


if __name__ == "__main__":
    main()
