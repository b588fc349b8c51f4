"""FWD-ONLY flash block sweep at the SERVING grids (VERDICT r3 #2, second half).

The _BLOCK_TABLE was tuned on fwd+bwd training steps; the sampling path runs
the forward kernel alone, at CFG-doubled batch (user b4 -> UNet b=8). Per the
round-4 lesson (NOTES: "sweep at the production grid, not (b,h)=(2,h)"), this
sweeps (bq, bk) candidates fwd-only at the exact CFG grids the sample bench
dispatches, scan-amortized and hoist-proofed (carry-perturbed q).

Usage: python tools/sample_fwd_sweep.py [shape-label ...]

CONCLUSION (round 5, NOTES.md "Serving-path ... CONCLUDED"): the only real
fwd-only block effect is l1 bk 1024->2048 at CFG-b8 (+4.8% kernel-level on a
~14% step slice ~= +0.7% step — below the +-2.4% drift band), and it INVERTS
at CFG-b2 (the table wins by 15%). No fwd-only table lands; recorded null.
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

# label: (B, H, S, D, candidates); B is the CFG batch (2x user batch)
_D64 = [(0, 0), (512, 2048), (512, 4096), (1024, 1024), (1024, 2048), (256, 1024)]
SHAPES = {
    "b4-l1": (8, 10, 4096, 64, _D64),
    "b4-l2": (8, 20, 1024, 64, [(0, 0), (512, 1024), (1024, 1024), (256, 1024)]),
    "b1-l1": (2, 10, 4096, 64, _D64),
    "b1-l2": (2, 20, 1024, 64, [(0, 0), (512, 1024), (1024, 1024), (256, 1024)]),
}
ITERS = 30


def bench(b, h, s, d, block_q, block_k, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)

    @jax.jit
    def fwd_n(q, k, v):
        def body(qc, _):
            o = flash_attention(qc, k, v, block_q=block_q, block_k=block_k)
            # feed the output back so no iteration can be hoisted
            return (qc + (o * 1e-30).astype(qc.dtype)), None

        qf, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(qf.astype(jnp.float32))

    try:
        _ = float(fwd_n(q, k, v))
        t0 = time.perf_counter()
        _ = float(fwd_n(q, k, v))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    flops = 4 * b * h * s * s * d  # 2 matmuls fwd-only
    print(f"  {label}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    only = set(sys.argv[1:])
    for name, (b, h, s, d, cands) in SHAPES.items():
        if only and name not in only:
            continue
        print(f"{name} (b={b} h={h} S={s} d={d}):", flush=True)
        for bq, bk in cands:
            bench(b, h, s, d, bq, bk, f"bq={bq or 'table'} bk={bk or 'table'}")
