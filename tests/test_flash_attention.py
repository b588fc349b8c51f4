"""Pallas flash attention vs reference math, interpret mode (CPU).

On-chip verification happens in the TPU benches; this guards the kernel math
(fwd + custom-vjp backward, odd head dims, kv-tail masking) in CI.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture()
def interpreted_flash(monkeypatch):
    import jax.experimental.pallas as pl

    import neurosis_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)
    return fa


@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 256, 256, 64),  # aligned self-attn
        (1, 2, 300, 77, 40),  # cross-attn, odd dims, kv masking
    ],
)
def test_flash_forward_and_grads(interpreted_flash, shape):
    from neurosis_tpu.ops.attention import _xla_attention

    fa = interpreted_flash
    b, h, sq, skv, d = shape
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, sq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, skv, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, skv, d), jnp.float32)

    ref = _xla_attention(q, k, v)
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=1e-4)

    g_ref = jax.grad(lambda *a: jnp.sum(_xla_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(
        lambda *a: jnp.sum(fa.flash_attention(*a, block_q=128, block_k=128) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-5, rtol=1e-3)
