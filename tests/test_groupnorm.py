"""GroupNorm32 vs torch.nn.GroupNorm on shared weights (fp32 + bf16 paths)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.modules.layers import GroupNorm32  # noqa: E402


def _set_params(template, scale, bias):
    """Fill the (implementation-dependent) GroupNorm param tree."""
    # template: {"params": {...}} with exactly one scale + one bias leaf
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path, leaf in flat:
        key = str(path).lower()
        if "scale" in key or "weight" in key:
            out.append(jnp.asarray(scale))
        elif "bias" in key:
            out.append(jnp.asarray(bias))
        else:  # pragma: no cover
            out.append(leaf)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), out)


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
    params = _set_params(gn.init(jax.random.PRNGKey(0), jnp.asarray(x)), scale, bias)
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))
    ref = _torch_gn(x, groups, 1e-5, scale, bias)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


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


class TestCustomVJP:
    """NEUROSIS_GN_VJP=1 path (ops/groupnorm.py): identical math to the plain
    flax path, bf16 residuals in the backward."""

    def _module_pair(self, monkeypatch, x, groups=32):
        gn = GroupNorm32(num_groups=groups, epsilon=1e-6)
        params = gn.init(jax.random.PRNGKey(0), x)
        # non-trivial affine so dscale/dbias are exercised
        rng = np.random.RandomState(3)
        params = _set_params(
            params,
            rng.randn(x.shape[-1]).astype(np.float32) * 0.5 + 1.0,
            rng.randn(x.shape[-1]).astype(np.float32) * 0.2,
        )
        return gn, params

    @pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)])
    def test_forward_matches_plain(self, monkeypatch, dtype, atol):
        rng = np.random.RandomState(4)
        x = jnp.asarray((rng.randn(2, 8, 8, 64) * 3 - 5).astype(np.float32), dtype)
        gn, params = self._module_pair(monkeypatch, x)
        monkeypatch.delenv("NEUROSIS_GN_VJP", raising=False)
        plain = gn.apply(params, x)
        monkeypatch.setenv("NEUROSIS_GN_VJP", "1")
        custom = gn.apply(params, x)
        assert custom.dtype == plain.dtype == dtype
        np.testing.assert_allclose(
            np.asarray(custom, np.float32), np.asarray(plain, np.float32), atol=atol, rtol=atol
        )

    def test_grads_match_plain(self, monkeypatch):
        rng = np.random.RandomState(5)
        x = jnp.asarray((rng.randn(2, 8, 8, 64) * 2 + 1).astype(np.float32))
        dy = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
        gn, params = self._module_pair(monkeypatch, x)

        def loss(p, xin):
            return jnp.sum(gn.apply(p, xin) * dy)

        monkeypatch.delenv("NEUROSIS_GN_VJP", raising=False)
        gp0, gx0 = jax.grad(loss, argnums=(0, 1))(params, x)
        monkeypatch.setenv("NEUROSIS_GN_VJP", "1")
        gp1, gx1 = jax.grad(loss, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-4, rtol=1e-4)
        for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(gp0), jax.tree_util.tree_leaves_with_path(gp1)
        ):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-3, rtol=1e-4)

    def test_bf16_residuals_not_fp32(self, monkeypatch):
        """The VJP saves x in its original dtype: the residual tree of the
        custom path must contain no fp32 tensor of x's full size."""
        monkeypatch.setenv("NEUROSIS_GN_VJP", "1")
        from neurosis_tpu.ops.groupnorm import group_norm

        x = jnp.zeros((1, 16, 16, 64), jnp.bfloat16)
        scale = jnp.ones((64,), jnp.float32)
        bias = jnp.zeros((64,), jnp.float32)
        _, vjp_fn = jax.vjp(lambda xi: group_norm(xi, scale, bias, 32, 1e-6), x)
        big_fp32 = [
            l
            for l in jax.tree_util.tree_leaves(vjp_fn)
            if hasattr(l, "dtype")
            and l.dtype == jnp.float32
            and getattr(l, "size", 0) >= x.size
        ]
        assert not big_fp32, [l.shape for l in big_fp32]
