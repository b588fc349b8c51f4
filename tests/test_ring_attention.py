"""Ring attention over the 8-device virtual mesh == full attention."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from neurosis_tpu.ops.attention import _xla_attention  # noqa: E402
from neurosis_tpu.ops.ring_attention import ring_attention_sharded  # noqa: E402


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_matches_full():
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("context",))

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 64, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 64, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 64, 16).astype(np.float32))

    ref = _xla_attention(q, k, v)
    out = ring_attention_sharded(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_grads_match():
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("context",))

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 32, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 32, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 32, 8).astype(np.float32))

    g_ref = jax.grad(lambda q, k, v: jnp.sum(_xla_attention(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(
        lambda q, k, v: jnp.sum(ring_attention_sharded(q, k, v, mesh) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3)
