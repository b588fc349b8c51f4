"""GeneralLPIPSWithDiscriminator + adaptive d_weight through the VAE engine."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurosis_tpu.losses.discriminator_loss import GeneralLPIPSWithDiscriminator  # noqa: E402
from neurosis_tpu.models.vae import Decoder, Encoder  # noqa: E402
from neurosis_tpu.trainer.vae_engine import AutoencodingEngine  # noqa: E402


def test_general_gan_adaptive_weight_steps():
    engine = AutoencodingEngine(
        encoder=Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        decoder=Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        loss=GeneralLPIPSWithDiscriminator(
            perceptual_weight=0.1, disc_start=1, disc_num_layers=1, learn_logvar=False
        ),
        g_optimizer=optax.adam(1e-3),
        d_optimizer=optax.adam(1e-3),
        disc_start=1,
        adaptive_disc_weight=True,
    )
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)}

    state = engine.init(jax.random.PRNGKey(0), batch)
    g_step = jax.jit(engine.g_step)
    d_step = jax.jit(engine.d_step)

    state, log_g = g_step(state, batch)
    assert np.isfinite(float(log_g["total"]))
    assert "train/scalars/d_weight" in log_g
    assert float(log_g["train/scalars/d_weight"]) >= 0.0

    state, log_d = d_step(state, batch)
    assert np.isfinite(float(log_d["total"]))
