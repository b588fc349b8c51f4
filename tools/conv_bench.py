"""Pallas implicit-GEMM conv3x3 vs XLA conv at SDXL ResBlock shapes (fwd+bwd).

Run on-chip: python tools/conv_bench.py
"""

from __future__ import annotations

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

from neurosis_tpu.ops.conv3x3 import _xla_conv, conv3x3

# (H, W, C, F) SDXL UNet ResBlock convs at 1024px (latent 128), batch 2
SHAPES = [
    (128, 128, 320, 320),
    (64, 64, 640, 640),
    (32, 32, 1280, 1280),
    (64, 64, 1280, 640),  # upsample-path concat-reduced
    (32, 32, 2560, 1280),  # concat skip
]
B = 2
ITERS = 50  # amortize the ~30ms remote dispatch+transfer overhead


def bench(fn, x, w, fwd_only=False):
    if fwd_only:
        def loss(x, w):
            return jnp.sum(fn(x, w).astype(jnp.float32))
        step = loss
    else:
        def loss(x, w):
            return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1))

        def step(x, w):
            gx, gw = g(x, w)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

    @jax.jit
    def run(x, w):
        def body(carry, _):
            xc, acc = carry
            r = step(xc, w)
            xn = xc + (r * 1e-30).astype(xc.dtype)
            return (xn, acc + r), None

        (xf, acc), _ = jax.lax.scan(body, (x, jnp.asarray(0.0, jnp.float32)), None, length=ITERS)
        return acc + jnp.sum(xf.astype(jnp.float32))

    _ = float(run(x, w))  # compile+warmup; host transfer = completion barrier
    t0 = time.perf_counter()
    _ = float(run(x, w))
    return (time.perf_counter() - t0) / ITERS


def main():
    out = {}
    for h, w_len, c, f in SHAPES:
        key = f"{h}x{w_len}x{c}->{f}"
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w_len, c), jnp.bfloat16)
        wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, f), jnp.bfloat16) * 0.05
        flops = 2 * 9 * B * h * w_len * c * f
        row = {}
        for name, fn in (("xla", _xla_conv), ("pallas", conv3x3)):
            for tag, fwd_only in (("fwd", True), ("fwdbwd", False)):
                fl = flops if fwd_only else 3 * flops
                try:
                    dt = bench(fn, x, wt, fwd_only=fwd_only)
                    row[f"{name}_{tag}_tf"] = round(fl / dt / 1e12, 1)
                    row[f"{name}_{tag}_ms"] = round(dt * 1e3, 3)
                except Exception as e:  # noqa: BLE001
                    row[f"{name}_{tag}_tf"] = f"err:{type(e).__name__}"
        out[key] = row
        print(json.dumps({key: row}), flush=True)
    print(json.dumps({"device": str(jax.devices()[0]), "results": out}, indent=1))


if __name__ == "__main__":
    main()
