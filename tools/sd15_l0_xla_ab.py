"""Plain-XLA attention vs Pallas two-pass at the sd15 l0 grid (VERDICT r4 #5).

The one untried A/B on the sd15 record: does XLA's own fusion of
softmax(QK^T)V beat the Pallas two-pass kernel at 16k tokens / d=40, where
the Pallas kernel is capped at ~52.5 TF/s by 48/128-sublane contraction?
XLA materializes the (S, S) probability tensor, so at S=16384 the score is
HBM feasibility first, bandwidth second: logits alone are b*h*16384^2 bytes
(b4/h8 = 17 GB bf16 — over the v5e's 16 GB even before residuals).

Runs fwd+bwd (the training path) ABAB in one process, largest feasible
batch per impl, and quotes per-batch-element TF/s so impls at different
feasible batches stay comparable.

Usage: python tools/sd15_l0_xla_ab.py
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

H, S, D = 8, 16384, 40
ITERS = 5


def xla_attn(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / (D ** 0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def bench(attn, b, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, H, S, D), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32))

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
        _ = float(step_n(q, k, v))  # compile + warm
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(step_n(q, k, v))
            times.append((time.perf_counter() - t0) / ITERS)
        dt = min(times)
    except Exception as e:
        print(f"  {label} b={b}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    flops = 7 * 2 * b * H * S * S * D  # 2 fwd + 5 bwd matmul passes at real d
    tf = flops / dt / 1e12
    # ms per batch element is the cross-batch comparable number (impls cap out
    # at different feasible batches); lower is better
    print(f"  {label} b={b}: {dt*1e3:.1f} ms  {tf:.1f} TF/s  ({dt*1e3/b:.1f} ms/batch-elem)",
          flush=True)
    return dt / b


if __name__ == "__main__":
    print(f"sd15 l0 fwd+bwd A/B (h={H} S={S} d={D}):", flush=True)
    # feasibility ladder for XLA (17 GB logits at b4 can't fit; walk down)
    xla_best = None
    for b in (4, 2, 1):
        xla_best = bench(xla_attn, b, "xla")
        if xla_best is not None:
            break
    # ABAB the Pallas default at the real grid against a re-run of the winner
    pallas = bench(lambda q, k, v: flash_attention(q, k, v), 4, "pallas-two-pass")
    if xla_best is not None:
        bench(xla_attn, b, "xla(rerun)")
    if pallas is not None:
        bench(lambda q, k, v: flash_attention(q, k, v), 4, "pallas(rerun)")
