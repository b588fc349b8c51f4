"""Head-group A/B for the wide-row self-attention cells (NEUROSIS_FLASH_WIDE_HG).

h=20 (SDXL level-2) only divides by powers of 2 down to hg=4, which leaves
5 cells per batch element; hg=5 gives 4 fatter cells on a path the round-5
probes showed is per-call-overhead-bound (~1 ms/call at CFG-b8, all kernel
families within +-5%). ABAB in one process: hg in (4, 5), fwd-only at the
serving grid (8, 20, 1024, 64) and fwd+bwd at the training grid
(2, 20, 1024, 64). Flops quoted at 4 (fwd) / 14 (fwd+bwd) * b*h*s^2*d.

Usage: python tools/wide_hg_probe.py
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

import neurosis_tpu.ops.flash_attention as fa

ITERS = 50


def bench(b, h, s, d, hg_list, bwd, label):
    fa._WIDE_HG = hg_list
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)
    cfg = fa._wide_cfg(b, h, d, s, s, bwd=bwd)

    if bwd:
        grad = jax.grad(lambda *a: jnp.sum(fa.flash_attention(*a).astype(jnp.float32)), argnums=(0, 1, 2))

        @jax.jit
        def step_n(q, k, v):
            def body(carry, _):
                qc, acc = carry
                g = grad(qc, k, v)
                qn = qc + (g[0] * 1e-30).astype(qc.dtype)
                return (qn, acc + jnp.sum(g[1].astype(jnp.float32))), None

            (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
            return acc + jnp.sum(qf.astype(jnp.float32))

        passes = 14
    else:

        @jax.jit
        def step_n(q, k, v):
            def body(qc, _):
                o = fa.flash_attention(qc, k, v)
                return (qc + (o * 1e-30).astype(qc.dtype)), None

            qf, _ = jax.lax.scan(body, q, None, length=ITERS)
            return jnp.sum(qf.astype(jnp.float32))

        passes = 4

    try:
        _ = float(step_n(q, k, v))
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(step_n(q, k, v))
            times.append((time.perf_counter() - t0) / ITERS)
        dt = min(times)
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    tf = passes * b * h * s * s * d / dt / 1e12
    print(f"  {label}: cfg={cfg}  {dt*1e3:.3f} ms  {tf:.1f} TF/s", flush=True)


if __name__ == "__main__":
    for rep in range(2):  # ABAB
        print(f"serving fwd-only (8,20,1024,64), rep {rep}:", flush=True)
        bench(8, 20, 1024, 64, (8, 4, 2, 1), False, "hg<=4 (default)")
        bench(8, 20, 1024, 64, (8, 5, 4, 2, 1), False, "hg=5")
        print(f"train fwd+bwd (2,20,1024,64), rep {rep}:", flush=True)
        bench(2, 20, 1024, 64, (8, 4, 2, 1), True, "hg<=4 (default)")
        bench(2, 20, 1024, 64, (8, 5, 4, 2, 1), True, "hg=5")
