"""Serving-path probe for the 1024-token SDXL level-2 self-attention.

The sample step spends ~60 self-attn calls/step at (b_cfg, 20, 1024, 64);
the fwd sweep measured only ~30 TF/s there at b4 (tools/sample_fwd_sweep.py).
This probes kernel-family alternatives fwd-only at that exact grid: the
default wide-self dispatch, WIDE_SELF=0 (chunked/two-pass), and plain XLA
attention (jnp softmax matmuls, which XLA fuses) — each in a fresh process
because the family knobs are read at import.

Usage: python tools/serving_l2_probe.py            # driver, prints table
       python tools/serving_l2_probe.py one <impl> <batch>   # worker

CONCLUSION (round 5, NOTES.md "Serving-path ... CONCLUDED"): b8 default 40.3,
wide_self=0 41.6, two-pass 37.3, XLA 16.8 TF/s — families within +-5%, XLA
2.4x slower; b2 rows are per-call-overhead-bound (~0.65 ms floor). No
fwd-only dispatch lands; the l2 shape is overhead-bound, not kernel-bound.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [  # label -> env overrides
    ("default(wide-self)", {}),
    ("wide_self=0", {"NEUROSIS_FLASH_WIDE_SELF": "0"}),
    ("chunked=0(two-pass)", {"NEUROSIS_FLASH_WIDE_SELF": "0", "NEUROSIS_FLASH_CHUNKED": "0"}),
    ("xla", {"IMPL": "xla"}),
]


def worker(impl: str, batch: int) -> None:
    import time

    import jax

    cache = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    b, h, s, d = batch, 20, 1024, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)

    if impl == "xla":
        def attn(q, k, v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / (d ** 0.5)
            p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)
    else:
        from neurosis_tpu.ops.flash_attention import flash_attention as attn

    ITERS = 50

    @jax.jit
    def fwd_n(q, k, v):
        def body(qc, _):
            o = attn(qc, k, v)
            return (qc + (o * 1e-30).astype(qc.dtype)), None

        qf, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(qf.astype(jnp.float32))

    _ = float(fwd_n(q, k, v))
    t0 = time.perf_counter()
    _ = float(fwd_n(q, k, v))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 4 * b * h * s * s * d
    print(f"{dt * 1e3:.3f} ms  {flops / dt / 1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        worker(sys.argv[2], int(sys.argv[3]))
        sys.exit(0)
    for batch in (8, 2):
        print(f"l2 self-attn (b={batch} h=20 S=1024 d=64), fwd-only:", flush=True)
        for label, env in CONFIGS:
            base = {k: v for k, v in os.environ.items() if not k.startswith("NEUROSIS_FLASH_")}
            e = dict(base, **{k: v for k, v in env.items() if k != "IMPL"})
            impl = env.get("IMPL", "flash")
            r = subprocess.run(
                [sys.executable, __file__, "one", impl, str(batch)],
                env=e, capture_output=True, text=True, timeout=1200,
            )
            out = (r.stdout.strip().splitlines() or ["FAILED"])[-1]
            if r.returncode:
                out = "FAILED: " + (r.stderr.strip().splitlines() or ["?"])[-1][:120]
            print(f"  {label:22s} {out}", flush=True)
