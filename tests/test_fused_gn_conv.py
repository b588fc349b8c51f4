"""Fused GroupNorm+SiLU->conv3x3 (ops/conv3x3.py gn_silu_conv3x3) parity.

The fused path must match the unfused composition GroupNorm32 -> silu ->
conv exactly enough for training: same fwd values (bf16 noise) and the same
gradients — including the GroupNorm statistics chain, which the custom_vjp
delegates to JAX by returning only the direct (x, a, b) partials.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

os.environ.setdefault("NEUROSIS_PALLAS_INTERPRET", "1")


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(float(np.max(np.abs(b))), 1e-6)
    return float(np.max(np.abs(a - b))) / scale


def test_gn_fold_matches_groupnorm():
    """x*a + b from the folded affine == GroupNorm32(x) (fp32)."""
    from neurosis_tpu.modules.layers import GroupNorm32

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    gn = GroupNorm32(num_groups=8)
    v = gn.init(jax.random.PRNGKey(0), x)
    # non-trivial scale/bias
    v = jax.tree_util.tree_map(lambda p: p + jnp.asarray(rng.randn(*p.shape), p.dtype) * 0.3, v)

    want = gn.apply(v, x)
    a, b = gn.apply(v, x, fold=True)
    got = x * a[:, None, None, :] + b[:, None, None, :]
    assert _rel_err(got, want) < 2e-5
    # the fold path declares the identical param tree
    v2 = gn.init(jax.random.PRNGKey(0), x, fold=True)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)


def test_gn_silu_conv3x3_fwd_bwd_parity():
    import neurosis_tpu.ops.conv3x3 as m

    assert m._INTERPRET or jax.default_backend() == "tpu"
    rng = np.random.RandomState(1)
    bsz, h, w, c, f = 2, 16, 16, 64, 96
    x = jnp.asarray(rng.randn(bsz, h, w, c).astype(np.float32), jnp.bfloat16)
    a = jnp.asarray(1.0 + 0.2 * rng.randn(bsz, c).astype(np.float32))
    b = jnp.asarray(0.3 * rng.randn(bsz, c).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32) * 0.05, jnp.bfloat16)

    def unfused(x, a, b, wt):
        return m._xla_conv(m.gn_silu_affine(x, a, b), wt)

    got = m.gn_silu_conv3x3(x, a, b, wt).astype(jnp.float32)
    want = unfused(x, a, b, wt).astype(jnp.float32)
    assert _rel_err(got, want) < 5e-3  # bf16 noise

    loss_f = lambda fn: lambda *args: jnp.sum(fn(*args).astype(jnp.float32) ** 2)
    gp = jax.grad(loss_f(m.gn_silu_conv3x3), argnums=(0, 1, 2, 3))(x, a, b, wt)
    gx = jax.grad(loss_f(unfused), argnums=(0, 1, 2, 3))(x, a, b, wt)
    # bf16: both paths evaluate silu' at the bf16-rounded pre-activation
    # (same rounding point as the fwd kernel) — residual error is matmul
    # rounding only, measured ~4e-3 (the fp32 test below pins the math
    # itself to ~2e-7)
    for name, ga, gb in zip("xabw", gp, gx):
        assert _rel_err(ga, gb) < 1e-2, name

    # fp32 inputs: exact gradient parity incl. the conv + silu' chain
    x32, wt32 = x.astype(jnp.float32), wt.astype(jnp.float32)
    gp = jax.grad(loss_f(m.gn_silu_conv3x3), argnums=(0, 1, 2, 3))(x32, a, b, wt32)
    gx = jax.grad(loss_f(unfused), argnums=(0, 1, 2, 3))(x32, a, b, wt32)
    for name, ga, gb in zip("xabw", gp, gx):
        assert _rel_err(ga, gb) < 1e-5, name


def test_resblock_fused_matches_unfused(monkeypatch):
    """ResBlock with NEUROSIS_FUSED_GN_CONV=1 (interpret) == the plain path,
    values and grads, on the same params — incl. the GN stats chain."""
    from neurosis_tpu.models.unet import ResBlock

    rng = np.random.RandomState(2)
    # supported gate: h*w >= 1024, 128-aligned channels
    x = jnp.asarray(rng.randn(1, 32, 32, 128).astype(np.float32), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(1, 32).astype(np.float32), jnp.bfloat16)

    for scale_shift in (False, True):
        blk = ResBlock(
            channels=128, emb_channels=32, dtype=jnp.bfloat16, use_scale_shift_norm=scale_shift
        )
        monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "0")
        v = blk.init(jax.random.PRNGKey(0), x, emb)
        # non-zero out_layers.3 (zero-init hides the second fusion site)
        v = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.random.RandomState(3).randn(*p.shape), p.dtype) * 0.02, v
        )
        want = blk.apply(v, x, emb)

        monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "1")
        v_fused = blk.init(jax.random.PRNGKey(0), x, emb)
        assert jax.tree_util.tree_structure(v_fused) == jax.tree_util.tree_structure(v)
        got = blk.apply(v, x, emb)
        # bf16 noise: the fused path normalizes in fp32 and casts once; the
        # unfused path rounds after GN and again after silu
        assert _rel_err(got, want) < 1.5e-2, f"scale_shift={scale_shift}"

        def loss(params, the_blk, fused, xx, ee):
            monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "1" if fused else "0")
            return jnp.sum(the_blk.apply(params, xx, ee).astype(jnp.float32) ** 2)

        # Gradients: compare both bf16 paths against an fp32 oracle — bf16
        # GN-stat/shift grads cancel over 1024 spatial terms, so fused and
        # unfused each carry a few % of noise in different directions (the
        # fused path is measurably CLOSER to fp32: it applies the affine and
        # scale/shift in fp32). Assert fused is no farther from truth.
        blk32 = ResBlock(
            channels=128, emb_channels=32, dtype=jnp.float32, use_scale_shift_norm=scale_shift
        )
        go = jax.grad(
            lambda p: loss(p, blk32, False, x.astype(jnp.float32), emb.astype(jnp.float32))
        )(v)
        gf = jax.grad(lambda p: loss(p, blk, True, x, emb))(v)
        gu = jax.grad(lambda p: loss(p, blk, False, x, emb))(v)
        for (pf, lo), lf, lu in zip(
            jax.tree_util.tree_leaves_with_path(go),
            jax.tree_util.tree_leaves(gf),
            jax.tree_util.tree_leaves(gu),
        ):
            lo = np.asarray(lo, np.float32)
            lf = np.asarray(lf, np.float32)
            lu = np.asarray(lu, np.float32)
            n = max(np.linalg.norm(lo), 1e-6)
            err_fused = np.linalg.norm(lf - lo) / n
            err_unfused = np.linalg.norm(lu - lo) / n
            assert err_fused <= err_unfused + 0.02, (
                scale_shift,
                jax.tree_util.keystr(pf),
                err_fused,
                err_unfused,
            )


def test_fused_chain_fp32_exact():
    """fp32 end-to-end: fold -> fused kernel vs GroupNorm32 -> silu -> conv,
    grads wrt GN params, x, and w — pins the stats-chain composition that the
    custom_vjp delegates to JAX (direct partials only)."""
    import neurosis_tpu.ops.conv3x3 as m
    from neurosis_tpu.modules.layers import GroupNorm32

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 128).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    gn = GroupNorm32(32)
    v = gn.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(lambda p: p + jnp.asarray(rng.randn(*p.shape), p.dtype) * 0.3, v)

    def fused(v, x, wt):
        a, b = gn.apply(v, x, fold=True)
        return jnp.sum(m.gn_silu_conv3x3(x, a, b, wt) ** 2)

    def unfused(v, x, wt):
        h = gn.apply(v, x)
        h = h * jax.nn.sigmoid(h)
        return jnp.sum(m._xla_conv(h, wt) ** 2)

    assert abs(float(fused(v, x, wt)) - float(unfused(v, x, wt))) / float(unfused(v, x, wt)) < 1e-5
    gf = jax.grad(fused, argnums=(0, 1, 2))(v, x, wt)
    gu = jax.grad(unfused, argnums=(0, 1, 2))(v, x, wt)
    for lf, lu in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gu)):
        assert _rel_err(lf, lu) < 1e-4


def test_vae_resnetblock_fused_matches_unfused(monkeypatch):
    """models/vae.py ResnetBlock fused path (eps=1e-6 GN) == plain path."""
    from neurosis_tpu.models.vae import ResnetBlock

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 32, 32, 128).astype(np.float32), jnp.bfloat16)
    blk = ResnetBlock(in_channels=128, dtype=jnp.bfloat16)

    monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "0")
    v = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(v, x)

    monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "1")
    v_fused = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_fused) == jax.tree_util.tree_structure(v)
    got = blk.apply(v, x)
    assert _rel_err(got, want) < 1.5e-2


def test_resblock_skip_temb_scale_shift_exclusive():
    """skip_t_emb + use_scale_shift_norm raises like the reference
    (openaimodel.py:266-269) instead of folding mismatched affine halves."""
    from neurosis_tpu.models.unet import ResBlock

    blk = ResBlock(channels=32, emb_channels=8, skip_t_emb=True, use_scale_shift_norm=True)
    x = jnp.zeros((1, 8, 8, 32))
    emb = jnp.zeros((1, 8))
    with pytest.raises(ValueError, match="mutually exclusive"):
        blk.init(jax.random.PRNGKey(0), x, emb)


def test_fused_gate_defaults(monkeypatch):
    """Default fused-GN gating: backend-driven (off on CPU so interpret-mode
    env leakage can't drag parity suites through interpreted kernels), env
    override wins; dtype gate uses the PROMOTED compute dtype."""
    from neurosis_tpu.modules.layers import conv_compute_dtype, fused_gn_conv_enabled, gn_conv_fuse_ok

    monkeypatch.delenv("NEUROSIS_FUSED_GN_CONV", raising=False)
    assert fused_gn_conv_enabled() == (jax.default_backend() == "tpu")
    monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "0")
    assert not fused_gn_conv_enabled()
    monkeypatch.setenv("NEUROSIS_FUSED_GN_CONV", "1")
    assert fused_gn_conv_enabled()
    # dtype=None + bf16 input promotes to fp32 -> must NOT pass the bf16 gate
    assert conv_compute_dtype(None, jnp.bfloat16) == jnp.float32
    assert not gn_conv_fuse_ok((1, 64, 64, 640), 640, None, jnp.bfloat16)
    assert gn_conv_fuse_ok((1, 64, 64, 640), 640, jnp.bfloat16, jnp.bfloat16)


def test_gn_silu_conv3x3_supported_gate():
    from neurosis_tpu.ops.conv3x3 import gn_silu_conv3x3_supported

    ok = (1, 64, 64, 640)
    assert gn_silu_conv3x3_supported(ok, (3, 3, 640, 640), 1, 1, jnp.bfloat16)
    assert not gn_silu_conv3x3_supported(ok, (3, 3, 640, 640), 2, 1, jnp.bfloat16)
    assert not gn_silu_conv3x3_supported((1, 64, 64, 320), (3, 3, 320, 320), 1, 1, jnp.bfloat16)
