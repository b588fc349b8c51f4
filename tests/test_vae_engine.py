"""Smoke: VAE/GAN AutoencodingEngine — alternating G/D steps run and learn."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr  # noqa: E402
from neurosis_tpu.models.vae import Decoder, Encoder  # noqa: E402
from neurosis_tpu.trainer.vae_engine import AutoencodingEngine  # noqa: E402


def test_vae_gan_alternating_steps():
    engine = AutoencodingEngine(
        encoder=Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        decoder=Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        loss=AutoencoderLPIPSWithDiscr(
            perceptual_weight=0.1, disc_start=2, disc_lambda_r1=0.1, disc_n_layers=1
        ),
        g_optimizer=optax.adam(1e-3),
        d_optimizer=optax.adam(1e-3),
        kl_weight=1e-6,
        disc_start=2,
    )
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)}

    state = engine.init(jax.random.PRNGKey(0), batch)
    g_step = jax.jit(engine.g_step)
    d_step = jax.jit(engine.d_step)

    totals = []
    for i in range(6):
        idx = engine.train_step_schedule(i, int(state.step))
        if idx == 0:
            state, log = g_step(state, batch)
        else:
            state, log = d_step(state, batch)
        totals.append(float(log["total"]))

    assert np.isfinite(totals).all(), totals
    assert int(state.step) == 6
    # discriminator optimizer engaged after disc_start
    assert state.d_opt_state is not None
