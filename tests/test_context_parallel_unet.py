"""End-to-end context (sequence) parallelism through the UNet.

The op-level ring-attention tests (test_ring_attention.py) validate the
kernel; this drives the FULL UNet forward + grad with context_axis="context"
under a (data x context) virtual mesh via the plain-jit path the Trainer uses
(no enclosing shard_map: ops/attention.py opens its own over the ambient
mesh) and checks it matches the unsharded model exactly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from neurosis_tpu.models.unet import UNetModel  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

UNET_CFG = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[1, 2],  # self-attention at both levels
    channel_mult=[1, 2],
    num_heads=2,
    transformer_depth=1,
    context_dim=32,
    remat_policy="none",
)


def _inputs(bs=2, res=16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, res, res, 4).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 50, (bs,)).astype(np.float32))
    ctx = jnp.asarray(rng.randn(bs, 8, 32).astype(np.float32))
    return x, t, ctx


def test_unet_context_axis_matches_unsharded():
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "context"))

    x, t, ctx = _inputs()
    plain = UNetModel(**UNET_CFG)
    params = plain.init(jax.random.PRNGKey(0), x, t, ctx)
    ring = UNetModel(**UNET_CFG, context_axis="context")

    want = jax.jit(plain.apply)(params, x, t, ctx)

    with mesh:
        got = jax.jit(ring.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # gradients through the ring (ppermute loop + online-softmax merges)
    def loss(fn):
        return lambda p: jnp.sum(fn(p, x, t, ctx) ** 2)

    g_want = jax.jit(jax.grad(loss(plain.apply)))(params)
    with mesh:
        g_got = jax.jit(jax.grad(loss(ring.apply)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_want), jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3)


def test_unet_context_axis_no_mesh_falls_back():
    """Without an ambient mesh the context_axis model still runs (replicated
    single-program attention) and matches — correctness over parallelism."""
    x, t, ctx = _inputs()
    plain = UNetModel(**UNET_CFG)
    params = plain.init(jax.random.PRNGKey(0), x, t, ctx)
    ring = UNetModel(**UNET_CFG, context_axis="context")

    want = plain.apply(params, x, t, ctx)
    got = ring.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
