"""VQ autoencoding: regularizer plug-in on AutoencodingEngine
(reference regularizer_config, models/autoencoder.py:160-166), the
codebook-index AEIntegerWrapper (662-700), and pixel-space diffusion via
IdentityFirstStage (645-660)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurosis_tpu.losses.vae_loss import AutoencoderPerceptual  # noqa: E402
from neurosis_tpu.models.vae import Decoder, Encoder  # noqa: E402
from neurosis_tpu.modules.regularizers import VectorQuantizer  # noqa: E402
from neurosis_tpu.trainer.vae_engine import AutoencodingEngine  # noqa: E402


def make_vq_engine():
    common = dict(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32)
    return AutoencodingEngine(
        encoder=Encoder(double_z=False, z_channels=4, **common),
        decoder=Decoder(out_ch=3, z_channels=4, **common),
        loss=AutoencoderPerceptual(perceptual_weight=0.0),
        regularizer=VectorQuantizer(n_e=16, e_dim=4, beta=0.25),
        g_optimizer=optax.adam(1e-3),
        sample_posterior=False,
    )


def batch(bs=2, res=32, seed=0):
    rng = np.random.RandomState(seed)
    return {"image": jnp.asarray(rng.rand(bs, res, res, 3).astype(np.float32) * 2 - 1)}


def test_vq_engine_trains_and_logs_codebook_loss():
    eng = make_vq_engine()
    state = eng.init(jax.random.PRNGKey(0), batch())
    assert "regularizer" in state.params, "VQ params missing from the train state"
    emb0 = np.asarray(state.params["regularizer"]["embedding"]).copy()

    g_step = jax.jit(eng.g_step)
    losses = []
    for i in range(8):
        state, log = g_step(state, batch(seed=i))
        losses.append(float(log["total"]))
    assert all(np.isfinite(losses))
    assert float(log["train/loss/vq"]) >= 0.0
    # the codebook trained with the generator
    emb1 = np.asarray(state.params["regularizer"]["embedding"])
    assert np.abs(emb1 - emb0).max() > 0


def test_vq_engine_forward_quantizes_to_codebook():
    eng = make_vq_engine()
    state = eng.init(jax.random.PRNGKey(0), batch())
    z, recons, reg_log = eng.forward(state.params, batch()["image"], None)
    assert recons.shape == (2, 32, 32, 3)
    assert "min_encoding_indices" in reg_log
    idx = np.asarray(reg_log["min_encoding_indices"])
    assert idx.min() >= 0 and idx.max() < 16


def test_ae_integer_wrapper_roundtrip():
    from neurosis_tpu.models.autoencoder import AEIntegerWrapper, AutoencoderKL

    dd = dict(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32,
              double_z=False, z_channels=4)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    x = batch()["image"]
    variables = {"params": vae.init(jax.random.PRNGKey(0), x)["params"]}

    vq = VectorQuantizer(n_e=16, e_dim=4)
    z = vae.apply(variables, x, method="encode")
    vq_vars = {"params": vq.init(jax.random.PRNGKey(1), z)["params"]}

    wrapper = AEIntegerWrapper(vae, variables, vq, vq_vars, shape=(32, 32))
    idx = wrapper.encode(x)
    assert idx.shape == (2, 1024)
    assert int(jnp.max(idx)) < 16
    out = wrapper.decode(idx)
    assert out.shape == (2, 32, 32, 3)

    # decode must route indices through the codebook: identical indices →
    # identical outputs
    out2 = wrapper.decode(idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_identity_first_stage_pixel_diffusion():
    from test_engine_smoke import make_tiny_engine

    import dataclasses

    eng = make_tiny_engine()
    eng = dataclasses.replace(
        eng,
        first_stage=None,
        first_stage_encoder=None,
        first_stage_decoder=None,
        identity_first_stage=True,
        scale_factor=1.0,
    ) if dataclasses.is_dataclass(eng) else eng
    if not getattr(eng, "identity_first_stage", False):
        # engine is a plain class: set attributes directly
        eng.first_stage = None
        eng.first_stage_encoder = None
        eng.first_stage_decoder = None
        eng.identity_first_stage = True
        eng.scale_factor = 1.0

    # pixel-space: UNet must take 3-channel input; rebuild tiny UNet
    from neurosis_tpu.models.unet import UNetModel

    eng.model = UNetModel(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=[2], channel_mult=[1, 2], num_heads=2,
        transformer_depth=1, context_dim=32, num_classes="sequential",
        adm_in_channels=256,
    )

    rng = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32)),
        "caption_ids": jnp.asarray(rng.randint(0, 63, (2, 8)).astype(np.int32)),
        "uncond_ids": jnp.zeros((1, 8), jnp.int32),
        "size": jnp.asarray(rng.rand(2, 1).astype(np.float32)),
    }
    state, frozen = eng.init(jax.random.PRNGKey(0), b)
    assert "first_stage" not in frozen and "first_stage_encoder" not in frozen

    lat = eng.encode_first_stage(frozen, b["image"], jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(b["image"]))

    step = jax.jit(eng.train_step)
    state, log = step(state, frozen, b)
    assert np.isfinite(float(log["loss"]))


def test_gumbel_engine_grads_flow():
    """GumbelQuantizer under the engine: the rng must reach the quantizer so
    the gumbel straight-through path (not the argmax dead-end) runs and the
    proj head gets gradients."""
    from neurosis_tpu.modules.regularizers import GumbelQuantizer

    common = dict(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32)
    eng = AutoencodingEngine(
        encoder=Encoder(double_z=False, z_channels=4, **common),
        decoder=Decoder(out_ch=3, z_channels=4, **common),
        loss=AutoencoderPerceptual(perceptual_weight=0.0),
        regularizer=GumbelQuantizer(n_e=16, e_dim=4, num_hiddens=4),
        g_optimizer=optax.adam(1e-3),
        sample_posterior=False,
    )
    state = eng.init(jax.random.PRNGKey(0), batch())
    proj0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["regularizer"])[0]
    ).copy()
    g_step = jax.jit(eng.g_step)
    for i in range(3):
        state, log = g_step(state, batch(seed=i))
    assert np.isfinite(float(log["total"]))
    proj1 = np.asarray(jax.tree_util.tree_leaves(state.params["regularizer"])[0])
    assert np.abs(proj1 - proj0).max() > 0, "gumbel quantizer params did not train"


def test_ema_vq_engine_codebook_updates():
    """EMAVectorQuantizer through the engine: the mutable codebook lives in
    state.reg_stats and moves during g_step (no gradients involved)."""
    from neurosis_tpu.modules.regularizers import EMAVectorQuantizer

    common = dict(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32)
    eng = AutoencodingEngine(
        encoder=Encoder(double_z=False, z_channels=4, **common),
        decoder=Decoder(out_ch=3, z_channels=4, **common),
        loss=AutoencoderPerceptual(perceptual_weight=0.0),
        regularizer=EMAVectorQuantizer(n_e=16, e_dim=4, decay=0.8),
        g_optimizer=optax.adam(1e-3),
        sample_posterior=False,
    )
    state = eng.init(jax.random.PRNGKey(0), batch())
    assert state.reg_stats is not None and "cluster_size" in state.reg_stats
    cs0 = np.asarray(state.reg_stats["cluster_size"]).copy()

    g_step = jax.jit(eng.g_step)
    for i in range(3):
        state, log = g_step(state, batch(seed=i))
    assert np.isfinite(float(log["total"]))
    cs1 = np.asarray(state.reg_stats["cluster_size"])
    assert np.abs(cs1 - cs0).max() > 0, "EMA codebook statistics did not update"
    # eval path with the trained codebook
    z, recons, reg_log = eng.forward(state.params, batch()["image"], None, reg_stats=state.reg_stats)
    assert np.isfinite(np.asarray(recons)).all()
