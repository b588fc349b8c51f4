"""Microbench: our flash kernel vs jax library flash/splash at SDXL shapes."""
import time, functools, os, sys
import jax, jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = [(2, 20, 1024, 64), (2, 10, 4096, 64)]
ITERS = 30

def bench(fn, q, k, v, tag):
    @jax.jit
    def run(q, k, v):
        def body(acc, _):
            # make q depend on the carry so XLA cannot hoist the attention
            # computation out of the scan (acc is ~1e-38-scale noise)
            qi = q + (acc * 1e-30).astype(q.dtype)
            out, vjp = jax.vjp(fn, qi, k, v)
            dq, dk, dv = vjp(out)
            return jnp.sum(out.astype(jnp.float32)) * 1e-8 + jnp.sum(dq.astype(jnp.float32)) * 1e-8, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return acc
    try:
        _ = float(run(q, k, v))  # compile+warmup
        t0 = time.perf_counter()
        _ = float(run(q, k, v))
        dt = (time.perf_counter() - t0) / ITERS
        b, h, s, d = q.shape
        # fwd 2 matmuls + bwd 5 → 7 * 2*b*h*s*s*d flops
        fl = 7 * 2 * b * h * s * s * d
        print(f"{tag} {q.shape}: {dt*1e3:.3f} ms  {fl/dt/1e12:.1f} TF/s", flush=True)
    except Exception as e:
        print(f"{tag} {q.shape}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

from neurosis_tpu.ops.flash_attention import flash_attention as ours
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as lib_fa
from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

def xla_ref(q, k, v):
    return jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2)).swapaxes(1, 2)

for shape in SHAPES:
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    bench(ours, q, k, v, "ours     ")
    bench(functools.partial(lib_fa, causal=False), q, k, v, "lib_flash")
    bench(xla_ref, q, k, v, "xla_sdpa ")
