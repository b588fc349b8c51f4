"""Dump the optimized HLO of the 512px VAE-GAN G step and print the bodies of
the named fusions that dominate the device-time profile (tools/vae512_profile.py)
so the slow ops can be attributed to source ops.

Usage: python tools/vae512_hlo_dump.py [res [batch]] [fusion-name ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

_cache = os.path.expanduser("~/.cache/neurosis_tpu_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
import optax

from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr
from neurosis_tpu.models.vae import Decoder, Encoder
from neurosis_tpu.trainer.vae_engine import AutoencodingEngine

res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
names = sys.argv[3:]

dd = dict(
    ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    resolution=res, z_channels=4, dropout=0.0,
)
engine = AutoencodingEngine(
    encoder=Encoder(**dd, double_z=True, in_channels=3, dtype=jnp.bfloat16),
    decoder=Decoder(**dd, out_ch=3, dtype=jnp.bfloat16),
    loss=AutoencoderLPIPSWithDiscr(lpips_type="vgg", disc_start=1, disc_n_layers=3),
    g_optimizer=optax.adam(4.5e-6),
    d_optimizer=optax.adam(4.5e-6),
    kl_weight=1e-6,
    disc_start=1,
)
x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, 3).astype(np.float32) * 0.5)
state = engine.init(jax.random.PRNGKey(0), {"image": x})

ITERS = 4
xs = jnp.asarray(np.random.RandomState(1).randn(ITERS, batch, res, res, 3).astype(np.float32) * 0.5)


@jax.jit
def run(state, xs):
    def body(s, xi):
        s2, log = engine.g_step(s, {"image": xi})
        return s2, log["total"]

    return jax.lax.scan(body, state, xs)


print("lowering/compiling...", file=sys.stderr, flush=True)
compiled = run.lower(state, xs).compile()
txt = compiled.as_text()
out = f"/tmp/vae{res}_b{batch}_hlo.txt"
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB to {out}")

import re

for name in names:
    # print the fusion computation the instruction calls, plus its site
    print(f"\n===== {name} =====")
    site = [ln for ln in txt.splitlines() if f"%{name} =" in ln or f" {name} =" in ln]
    for ln in site[:3]:
        print("SITE:", ln.strip()[:500])
    m = re.search(rf"%?fused_computation[^\n]*{re.escape(name)}", txt)
    # fusion bodies are named by their calls= attribute; extract it
    for ln in site[:1]:
        cm = re.search(r"calls=([%\w.\-]+)", ln)
        if cm:
            body = cm.group(1).lstrip("%")
            bm = re.search(rf"^(%?{re.escape(body)}\b.*?)^\}}", txt, re.M | re.S)
            if bm:
                print("BODY:")
                print(bm.group(1)[:4000])
