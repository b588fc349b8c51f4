"""A/B the one-pass short-seq flash path at the SDXL level-2 shapes.

Compares table-mode (bq=1024 whole-q + one-pass kernels) against the round-2
blocks (bq=512, two-pass online-softmax kernels) at (2,20,1024,64) self- and
(2,20,1024,77) cross-attention, fwd+bwd, scan-amortized, host-barrier timed.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
_cache = os.path.expanduser('~/.cache/neurosis_tpu_xla')
os.makedirs(_cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
from neurosis_tpu.ops.flash_attention import flash_attention

def bench(sq, skv, d, bq, bk, batch=2, heads=20, iters=20):
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, skv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, skv, d), jnp.bfloat16)
    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=bq, block_k=bk).astype(jnp.float32))
    grad = jax.grad(loss, argnums=(0, 1, 2))
    @jax.jit
    def step_n(q, k, v):
        def body(carry, _):
            qc, acc = carry
            g = grad(qc, k, v)
            qn = qc + (g[0] * 1e-30).astype(qc.dtype)
            return (qn, acc + jnp.sum(g[1].astype(jnp.float32))), None
        (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=iters)
        return acc + jnp.sum(qf.astype(jnp.float32))
    _ = float(step_n(q, k, v))
    t0 = time.perf_counter()
    _ = float(step_n(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    flops = 3.5 * 4 * batch * heads * sq * skv * d
    return flops / dt / 1e12, dt * 1e6

for label, sq, skv, bq, bk in [
    ("self1024-r2blocks", 1024, 1024, 512, 1024),
    ("self1024-onepass", 1024, 1024, 0, 0),
    ("cross1024x77-r2blocks", 1024, 77, 512, 1024),
    ("cross1024x77-onepass", 1024, 77, 0, 0),
    ("self4096-table(unchanged)", 4096, 4096, 0, 0),
]:
    tf, us = bench(sq, skv, 64, bq, bk)
    print(json.dumps({"case": label, "tf_s": round(tf, 2), "us_per_call": round(us, 1)}), flush=True)
