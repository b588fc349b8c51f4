"""Profile the 512px VAE-GAN G step (vae_train bench config) — why does G run
~50 TF/s at 512px when the same pixels/batch at 256px ran 132 TF/s?

Reuses the vae_train bench construction (b1, no remat, disc_start=1) and
NeurosisProfiler's trace parsing for an op-keyed device-time table.

Usage: python tools/vae512_profile.py [res [batch]]
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


print("compiling/warming...", file=sys.stderr, flush=True)
s2, tot = run(state, xs)
_ = float(jnp.sum(tot))

trace_dir = f"/tmp/vae{res}_prof_b{batch}"
jax.profiler.start_trace(trace_dir)
s2, tot = run(state, xs)
_ = float(jnp.sum(tot))
jax.profiler.stop_trace()

from neurosis_tpu.trainer.profile import NeurosisProfiler

prof = NeurosisProfiler.__new__(NeurosisProfiler)
from pathlib import Path

prof.trace_dir = Path(trace_dir)
prof.row_limit = 25
rows = prof.key_averages(by="op")
total = sum(r["device_time_us"] for r in rows) or 1.0
print(f"G step at {res}px b{batch}: top ops by device time ({ITERS} iters traced)")
for r in rows[:25]:
    print(f"  {r['key'][:70]:70s} {r['count']:>5} {r['device_time_us']/ITERS:>10.0f} us/it {100*r['device_time_us']/total:>5.1f}%")
