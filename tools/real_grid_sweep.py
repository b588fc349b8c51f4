"""Flash block sweep at PRODUCTION grids (round-4 follow-up to the d=40 win).

The r3 table came from per-shape sweeps at generic (b, h); the d=40 re-sweep
at the real sd15-l0 grid moved the winner by +13%. Re-check every production
shape at its real (batch, heads): SDXL b2 (h=10 l1 / h=20 l2), SD1.5 b4
(h=8). fwd+bwd TF/s, scan-amortized, hoist-proofed.

Usage: python tools/real_grid_sweep.py [shape-label ...]
"""

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

from neurosis_tpu.ops.flash_attention import flash_attention

# label: (B, H, S, D, candidate (bq, bk) list; (0,0) = current table dispatch)
SHAPES = {
    "sdxl-l1": (2, 10, 4096, 64, [(0, 0), (512, 2048), (512, 4096), (1024, 2048), (1024, 1024)]),
    "sd15-l1": (4, 8, 4096, 80, [(0, 0), (512, 4096), (1024, 2048), (1024, 1024)]),
    "sd15-l2": (4, 8, 1024, 160, [(0, 0), (512, 1024), (1024, 1024)]),
    "sdxl-l2": (2, 20, 1024, 64, [(0, 0), (512, 1024), (1024, 1024)]),
}
ITERS = 10


def bench(b, h, s, d, block_q, block_k, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=block_q, block_k=block_k).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step_n(q, k, v):
        def body(carry, _):
            qc, acc = carry
            g = grad(qc, k, v)
            return (qc + (g[0] * 1e-30).astype(qc.dtype), acc + jnp.sum(g[1].astype(jnp.float32))), None

        (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
        return acc + jnp.sum(qf.astype(jnp.float32))

    try:
        _ = float(step_n(q, k, v))
        t0 = time.perf_counter()
        _ = float(step_n(q, k, v))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    flops = 9 * 2 * b * h * s * s * d
    print(f"  {label}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    only = set(sys.argv[1:])
    for name, (b, h, s, d, cands) in SHAPES.items():
        if only and name not in only:
            continue
        print(f"{name} (b={b} h={h} S={s} d={d}):", flush=True)
        for bq, bk in cands:
            bench(b, h, s, d, bq, bk, f"bq={bq or 'table'} bk={bk or 'table'}")
