"""Golden parity: Flax VAE Encoder/Decoder vs reference torch model on shared weights."""

import numpy as np
import pytest

# reference-parity tests need the read-only reference checkout
import pathlib as _pl

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

from _reference_loader import load_reference_vae

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.checkpoint import import_torch_params  # noqa: E402
from neurosis_tpu.models.vae import Decoder, Encoder  # noqa: E402

DD = dict(
    ch=32,
    out_ch=3,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[8],  # exercise the VAEAttnBlock at the 8x8 level
    in_channels=3,
    resolution=16,
    z_channels=4,
    double_z=True,
    dropout=0.0,
)


def _torch_state(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def test_encoder_parity():
    import torch

    mdl = load_reference_vae()
    torch.manual_seed(0)
    ref = mdl.Encoder(**DD, attn_type="vanilla")
    ref.eval()

    enc = Encoder(
        ch=DD["ch"],
        ch_mult=DD["ch_mult"],
        num_res_blocks=DD["num_res_blocks"],
        attn_resolutions=DD["attn_resolutions"],
        in_channels=3,
        resolution=DD["resolution"],
        z_channels=DD["z_channels"],
        double_z=True,
    )

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.encode(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    tmpl = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), xj))
    params, missing, unexpected = import_torch_params(tmpl["params"], _torch_state(ref))
    # quant_conv/regularizer live at engine level in our design
    unexpected = [k for k in unexpected if not k.startswith("quant_conv")]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    out = jax.jit(enc.apply)({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4, rtol=2e-3)


def test_decoder_parity():
    import torch

    mdl = load_reference_vae()
    torch.manual_seed(1)
    ref = mdl.Decoder(**DD, attn_type="vanilla")
    ref.eval()

    dec = Decoder(
        ch=DD["ch"],
        out_ch=3,
        ch_mult=DD["ch_mult"],
        num_res_blocks=DD["num_res_blocks"],
        attn_resolutions=DD["attn_resolutions"],
        resolution=DD["resolution"],
        z_channels=DD["z_channels"],
    )

    z = np.random.RandomState(1).randn(2, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(z)).numpy()

    zj = jnp.asarray(z.transpose(0, 2, 3, 1))
    tmpl = jax.eval_shape(lambda: dec.init(jax.random.PRNGKey(0), zj))
    params, missing, unexpected = import_torch_params(tmpl["params"], _torch_state(ref))
    unexpected = [k for k in unexpected if not k.startswith("post_quant_conv")]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    out = jax.jit(dec.apply)({"params": params}, zj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4, rtol=2e-3)


def test_remat_flag_preserves_params_and_outputs():
    """Encoder/Decoder remat=True (bwd-pass ResnetBlock rematerialization for
    the 512px VAE-GAN HBM budget) must not change the param tree or numerics."""
    import jax

    dd = dict(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)

    enc = Encoder(**dd, double_z=True, in_channels=3)
    enc_r = Encoder(**dd, double_z=True, in_channels=3, remat=True)
    p = enc.init(jax.random.PRNGKey(0), x)["params"]
    p_r = enc_r.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_r)
    np.testing.assert_allclose(
        np.asarray(enc.apply({"params": p}, x)),
        np.asarray(enc_r.apply({"params": p}, x)),
        atol=1e-6,
    )
    # grads flow through the remat blocks and match
    def loss(mod):
        return lambda prm: jnp.sum(mod.apply({"params": prm}, x) ** 2)

    g = jax.grad(loss(enc))(p)
    g_r = jax.grad(loss(enc_r))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    z = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 2), jnp.float32)
    dec = Decoder(**dd, out_ch=3)
    dec_r = Decoder(**dd, out_ch=3, remat=True)
    pd = dec.init(jax.random.PRNGKey(0), z)["params"]
    pd_r = dec_r.init(jax.random.PRNGKey(0), z)["params"]
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pd_r)
    np.testing.assert_allclose(
        np.asarray(dec.apply({"params": pd}, z)),
        np.asarray(dec_r.apply({"params": pd}, z)),
        atol=1e-6,
    )
