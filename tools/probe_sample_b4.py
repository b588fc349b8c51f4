"""On-chip probe: the sample-b4 CFG attention shape (grid (8,10,4)) that
stack-OOM'd Mosaic scoped VMEM in round 3 must now dispatch to the two-pass
kernels (grid-size term in _chunked_feasible) and RUN."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neurosis_tpu.ops.attention import dot_product_attention_dmajor

b, h, d, s = 8, 10, 64, 4096
key = jax.random.PRNGKey(0)
qt = jax.random.normal(key, (b, h, d, s), jnp.bfloat16)
kt = jax.random.normal(key, (b, h, d, s), jnp.bfloat16)
vt = jax.random.normal(key, (b, h, d, s), jnp.bfloat16)

f = jax.jit(dot_product_attention_dmajor)
t0 = time.time()
out = f(qt, kt, vt).block_until_ready()
print(f"compiled+ran in {time.time()-t0:.1f}s, out {out.shape} finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}")
# ref check on a slice
ref = jax.nn.softmax((qt[0, 0].T.astype(jnp.float32) @ kt[0, 0].astype(jnp.float32)) * (1.0 / d**0.5), axis=-1) @ vt[0, 0].T.astype(jnp.float32)
err = jnp.abs(out[0, 0].T.astype(jnp.float32) - ref).max()
print("max err vs xla ref slice:", float(err))
