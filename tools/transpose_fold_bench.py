"""A/B: fold the q/k/v D-major transposes into the projection matmuls.

The profile says 5.4% of the SDXL step is data formatting, mostly the
(B,S,H,D)->(B,H,D,S) shuffles around the flash kernel. Variant B asks XLA to
emit the projections directly in D-major layout (einsum bsc,chd->bhds) and
consume the D-major output in the out-projection (bhds,hdc->bsc), removing
every explicit transpose. Measures one SDXL self-attention block fwd+bwd.

Run on-chip: python tools/transpose_fold_bench.py
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

from neurosis_tpu.ops.flash_attention import _flash, flash_attention

B, S, C, H, D = 2, 4096, 640, 10, 64
ITERS = 20


def make_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 0.02
    return {
        "wq": jax.random.normal(k1, (C, H * D), jnp.bfloat16) * s,
        "wk": jax.random.normal(k2, (C, H * D), jnp.bfloat16) * s,
        "wv": jax.random.normal(k3, (C, H * D), jnp.bfloat16) * s,
        "wo": jax.random.normal(k4, (H * D, C), jnp.bfloat16) * s,
    }


def attn_current(p, x):
    q = (x @ p["wq"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    k = (x @ p["wk"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = (x @ p["wv"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v)  # wrapper transposes to D-major and back
    return o.transpose(0, 2, 1, 3).reshape(B, S, H * D) @ p["wo"]


def attn_folded(p, x):
    scale = 1.0 / (D ** 0.5)
    # projections straight to (B, H, D, S): XLA emits the transposed layout
    # inside the matmul instead of separate copies
    qt = jnp.einsum("bsc,chd->bhds", x, p["wq"].reshape(C, H, D))
    kt = jnp.einsum("bsc,chd->bhds", x, p["wk"].reshape(C, H, D))
    vt = jnp.einsum("bsc,chd->bhds", x, p["wv"].reshape(C, H, D))
    block_q, block_k = 1024, 1024  # d=64 defaults
    ot = _flash(qt, kt, vt, scale, block_q, block_k, S)
    return jnp.einsum("bhds,hdc->bsc", ot, p["wo"].reshape(H, D, C))


def bench(fn, p, x):
    def loss(p, x):
        return jnp.sum(fn(p, x).astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    @jax.jit
    def run(p, x):
        def body(carry, _):
            xc, acc = carry
            g = grad(p, xc)
            xn = xc + (g["wq"][0, 0] * 1e-30).astype(xc.dtype)
            return (xn, acc + jnp.sum(g["wo"].astype(jnp.float32))), None

        (xf, acc), _ = jax.lax.scan(body, (x, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
        return acc + jnp.sum(xf.astype(jnp.float32))

    _ = float(run(p, x))  # compile + warmup; host transfer = completion barrier
    t0 = time.perf_counter()
    _ = float(run(p, x))
    return (time.perf_counter() - t0) / ITERS


def main():
    p = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(9), (B, S, C), jnp.bfloat16)
    # sanity: same math
    a = attn_current(p, x)
    b = attn_folded(p, x)
    import numpy as np

    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    t_cur = bench(attn_current, p, x)
    t_fold = bench(attn_folded, p, x)
    print(
        json.dumps(
            {
                "max_abs_err": err,
                "current_ms": round(t_cur * 1e3, 3),
                "folded_ms": round(t_fold * 1e3, 3),
                "speedup": round(t_cur / t_fold, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
