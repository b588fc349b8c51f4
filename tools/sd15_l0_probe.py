"""SD1.5 level-0 (16k tokens, d=40) kernel probe (VERDICT r4 #1b).

The whole-row chunked kernels reject S=16384 at the table bq=512 (cumulative
st cap 4*16384*512 = 33.5 MB > 20 MB) and fall back to two-pass. At bq<=256
the cap passes (16.8 MB) — measure whether chunked-small-bq beats the
two-pass default at the real sd15-l0 grid (b=4, h=8)."""
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

B, H, S, D = 4, 8, 16384, 40
ITERS = 10


def bench(block_q, block_k, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=block_q, block_k=block_k).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step_n(q, k, v):
        def body(carry, _):
            qc, acc = carry
            g = grad(qc, k, v)
            qn = qc + (g[0] * 1e-30).astype(qc.dtype)
            return (qn, acc + jnp.sum(g[1].astype(jnp.float32))), None

        (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
        return acc + jnp.sum(qf.astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        _ = float(step_n(q, k, v))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(step_n(q, k, v))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    flops = 7 * 2 * B * H * S * S * D  # st+pv fwd, 5 bwd passes (real d=40)
    print(f"{label}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for bq, bk, label in [
        (0, 0, "default (table dispatch)"),
        (512, 1024, "two-pass 512/1024 (r3 default)"),
        (256, 1024, "chunked bq=256"),
        (128, 1024, "chunked bq=128"),
        (256, 2048, "chunked bq=256 bk=2048"),
    ]:
        bench(bq, bk, label)

# extra two-pass block sweep at the same shape (run with --extra)
if __name__ == "__main__" and "--extra" in sys.argv:
    for bq, bk, label in [
        (512, 2048, "two-pass 512/2048"),
        (1024, 1024, "two-pass 1024/1024"),
        (256, 4096, "two-pass 256/4096"),
    ]:
        bench(bq, bk, label)
