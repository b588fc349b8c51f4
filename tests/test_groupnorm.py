"""GroupNorm32 (channel-moment formulation) vs torch.nn.GroupNorm.

The TPU-friendly E[x^2]-E[x]^2 variance needs checking away from zero-mean
inputs (catastrophic cancellation) and under bf16 activations.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.modules.layers import GroupNorm32  # noqa: E402


def _torch_gn(x_nhwc, num_groups, eps, scale, bias):
    import torch

    gn = torch.nn.GroupNorm(num_groups, x_nhwc.shape[-1], eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        out = gn(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("mean,std", [(0.0, 1.0), (-7.0, 3.0)])
@pytest.mark.parametrize("c,groups", [(320, 32), (64, 32), (40, 8)])
def test_groupnorm_matches_torch(mean, std, c, groups):
    torch = pytest.importorskip("torch")  # noqa: F841
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 8, 8, c) * std + mean).astype(np.float32)
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)

    gn = GroupNorm32(num_groups=groups, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))
    ref = _torch_gn(x, groups, 1e-5, scale, bias)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("mean,std", [(50.0, 0.5), (500.0, 0.1), (-1000.0, 2.0)])
def test_groupnorm_extreme_mean_beats_torch(mean, std):
    """At |mean| >> std the pivot-shifted one-pass stats stay accurate where
    torch's own fp32 GroupNorm cancels (e.g. mean=500/std=0.1: ours 4e-4 vs
    torch 2.3e2 off the float64 truth). Compare against float64."""
    rng = np.random.RandomState(0)
    c, g = 320, 32
    x = (rng.randn(2, 8, 8, c) * std + mean).astype(np.float32)
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)

    x64 = x.astype(np.float64).reshape(2, 64, g, c // g)
    mu = x64.mean(axis=(1, 3), keepdims=True)
    var = x64.var(axis=(1, 3), keepdims=True)
    ref64 = ((x64 - mu) / np.sqrt(var + 1e-5)).reshape(2, 8, 8, c) * scale + bias

    gn = GroupNorm32(num_groups=g, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref64, atol=5e-3, rtol=1e-3)


def test_groupnorm_bf16_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 64).astype(np.float32)
    gn = GroupNorm32(num_groups=32)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_bf = gn.apply(params, jnp.asarray(x, jnp.bfloat16))
    out_f32 = gn.apply(params, jnp.asarray(x))
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), np.asarray(out_f32), atol=0.05, rtol=0.05
    )


def test_groupnorm_grads_finite():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 64).astype(np.float32) * 30 + 100)
    gn = GroupNorm32(num_groups=32)
    params = gn.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(jnp.square(gn.apply(p, x)))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    for leaf in jax.tree_util.tree_leaves((gp, gx)):
        assert np.all(np.isfinite(np.asarray(leaf)))
