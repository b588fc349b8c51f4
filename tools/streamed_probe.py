"""On-chip probe for the STREAMED flash kernels at the sd15-l0 shape.

1. Numeric check: streamed vs two-pass kernels on (1, 2, 16384, 40) — fwd
   output and all three grads (both are custom kernels; agreement bounds a
   Mosaic miscompile).
2. ABAB interleaved timing at the REAL sd15-l0 grid (b=4, h=8) — streamed
   dispatch (default) vs two-pass (fa._STREAMED=False), same process, same
   measurement window (NOTES methodology rule).
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
import numpy as np

import neurosis_tpu.ops.flash_attention as fa

ITERS = 10


def make_step(B, H, S, D):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32))

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

    return q, k, v, step_n


def numeric_check():
    B, H, S, D = 1, 2, 16384, 40
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)

    def run():
        out = jax.jit(fa.flash_attention)(q, k, v)
        g = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        return [np.asarray(out, np.float32)] + [np.asarray(t, np.float32) for t in g]

    assert fa._streamed_cfg(48, 512, 16384, 2, grid_cells=B * H * 32) is not None
    fa._STREAMED = True
    a = run()
    fa._STREAMED = False
    b = run()
    fa._STREAMED = True
    names = ["out", "dq", "dk", "dv"]
    for n, x, y in zip(names, a, b):
        scale = max(np.abs(y).max(), 1e-6)
        print(f"numeric {n}: max abs diff {np.abs(x - y).max():.3e} (scale {scale:.1f})", flush=True)


def make_fwd(B, H, S, D):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)

    @jax.jit
    def fwd_n(q, k, v):
        def body(carry, _):
            qc, acc = carry
            o = fa.flash_attention(qc, k, v)
            return (qc + (o * 1e-30).astype(qc.dtype), acc + jnp.sum(o.astype(jnp.float32))), None

        (qf, acc), _ = jax.lax.scan(body, (q, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
        return acc + jnp.sum(qf.astype(jnp.float32))

    return q, k, v, fwd_n


def timing_fwd():
    B, H, S, D = 4, 8, 16384, 40
    flops = 2 * 2 * B * H * S * S * D

    def build(mode, label):
        fa._STREAMED = mode
        q, k, v, fwd_n = make_fwd(B, H, S, D)
        t0 = time.perf_counter()
        _ = float(fwd_n(q, k, v))
        print(f"fwd {label} compile {time.perf_counter()-t0:.0f}s", flush=True)
        return lambda: float(fwd_n(q, k, v))

    run_a = build(True, "streamed")
    run_b = build(False, "two-pass")

    def timed(run):
        t0 = time.perf_counter()
        run()
        return (time.perf_counter() - t0) / ITERS

    for rep in range(3):
        dt_a = timed(run_a)
        dt_b = timed(run_b)
        print(
            f"fwd AB[{rep}] streamed {dt_a*1e3:.2f} ms ({flops/dt_a/1e12:.1f} TF/s)  "
            f"two-pass {dt_b*1e3:.2f} ms ({flops/dt_b/1e12:.1f} TF/s)",
            flush=True,
        )
    fa._STREAMED = True


def timing():
    B, H, S, D = 4, 8, 16384, 40
    flops = 7 * 2 * B * H * S * S * D

    # the dispatch reads fa._STREAMED/_SUBCHUNK at TRACE time, so each mode
    # needs its own jit object, traced+compiled while the globals are set
    def build(streamed, subchunk, label):
        fa._STREAMED = streamed
        fa._SUBCHUNK = subchunk
        q, k, v, step_n = make_step(B, H, S, D)
        t0 = time.perf_counter()
        _ = float(step_n(q, k, v))
        print(f"{label} compile {time.perf_counter()-t0:.0f}s", flush=True)
        return label, (lambda: float(step_n(q, k, v)))

    runs = [
        build(True, False, "streamed"),
        build(False, True, "twopass-sub"),
        build(False, False, "twopass-mono"),
    ]

    def timed(run):
        t0 = time.perf_counter()
        run()
        return (time.perf_counter() - t0) / ITERS

    for rep in range(3):
        line = []
        for label, run in runs:
            dt = timed(run)
            line.append(f"{label} {dt*1e3:.2f} ms ({flops/dt/1e12:.1f} TF/s)")
        print(f"AB[{rep}] " + "  ".join(line), flush=True)
    fa._STREAMED = True
    fa._SUBCHUNK = True


if __name__ == "__main__":
    if "--fwd-only" in sys.argv:
        timing_fwd()
        sys.exit(0)
    if "--timing-only" not in sys.argv:
        numeric_check()
    if "--numeric-only" not in sys.argv:
        timing()
