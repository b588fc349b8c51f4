"""A/B the chunked whole-row flash kernels vs the two-pass grid kernels at
table-default blocks, fwd+bwd, on every shape the frameworks' models hit.

Run twice:  NEUROSIS_FLASH_CHUNKED=0 python tools/chunked_ab.py   (baseline)
            python tools/chunked_ab.py                            (chunked)
"""
import json
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

from neurosis_tpu.ops.flash_attention import _CHUNKED, flash_attention

# (label, d, sq, skv, heads): SDXL levels 1/2 self+cross, SD1.5 levels,
# VAE mid-attention
SHAPES = [
    ("sdxl-l1-self", 64, 4096, 4096, 10),
    ("sdxl-l2-self", 64, 1024, 1024, 20),
    ("sdxl-l1-cross", 64, 4096, 77, 10),
    ("sdxl-l2-cross", 64, 1024, 77, 20),
    ("sd15-l0-self", 40, 16384, 16384, 8),
    ("sd15-l1-self", 80, 4096, 4096, 8),
    ("sd15-l2-self", 160, 1024, 1024, 8),
    ("vae-mid", 512, 4096, 4096, 1),
]


def bench_one(d, sq, skv, heads, batch=2, iters=20):
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, skv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, skv, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))

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


if __name__ == "__main__":
    mode = "chunked" if _CHUNKED else "twopass"
    for label, d, sq, skv, heads in SHAPES:
        try:
            tf, us = bench_one(d, sq, skv, heads)
        except Exception as e:  # noqa: BLE001 — report OOMs, keep sweeping
            print(json.dumps({"mode": mode, "case": label, "error": str(e)[:120]}), flush=True)
            continue
        print(
            json.dumps(
                {"mode": mode, "case": label, "tf_s": round(tf, 2), "us_per_call": round(us, 1)}
            ),
            flush=True,
        )
