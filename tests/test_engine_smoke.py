"""End-to-end smoke: tiny SD-style DiffusionEngine runs train steps and the
loss decreases (the fast_dev_run analog, SURVEY.md §4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurosis_tpu.diffusion import (  # noqa: E402
    DiscreteDenoiser,
    EpsPreconditioning,
    EpsWeighting,
    LegacyDDPMDiscretization,
    DiscreteSigmaGenerator,
    StandardDiffusionLoss,
)
from neurosis_tpu.models.unet import UNetModel  # noqa: E402
from neurosis_tpu.models.vae import Decoder, Encoder  # noqa: E402
from neurosis_tpu.modules.encoders import (  # noqa: E402
    ConcatTimestepEmbedderND,
    FrozenCLIPEmbedder,
    GeneralConditioner,
    with_embedder_names,
)
from neurosis_tpu.trainer.engine import DiffusionEngine  # noqa: E402


def make_tiny_engine(use_vae=True, use_ema=False):
    unet = UNetModel(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[2],
        channel_mult=[1, 2],
        num_heads=2,
        transformer_depth=1,
        context_dim=32,
        num_classes="sequential",
        adm_in_channels=256,
    )
    embedders = with_embedder_names(
        [
            FrozenCLIPEmbedder(
                input_key="caption", layer="hidden", layer_idx=1,
                vocab_size=64, width=32, layers=2, heads=2, max_length=8,
            ),
            ConcatTimestepEmbedderND(outdim=256, input_key="size"),
        ]
    )
    conditioner = GeneralConditioner(embedders=embedders)
    discretization = LegacyDDPMDiscretization()
    denoiser = DiscreteDenoiser(
        preconditioning=EpsPreconditioning(), num_idx=50, discretization=discretization
    )
    loss_fn = StandardDiffusionLoss(
        sigma_generator=DiscreteSigmaGenerator(discretization=discretization, num_idx=50),
        loss_weighting=EpsWeighting(),
        objective_type="edm",
    )
    enc = Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=16, z_channels=4) if use_vae else None
    dec = Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=16, z_channels=4) if use_vae else None
    return DiffusionEngine(
        model=unet,
        denoiser=denoiser,
        loss_fn=loss_fn,
        conditioner=conditioner,
        first_stage_encoder=enc,
        first_stage_decoder=dec,
        optimizer=optax.adam(1e-3),
        scale_factor=0.18215,
        use_ema=use_ema,
    )


def make_batch(bs=2, res=16):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randn(bs, res, res, 3).astype(np.float32)),
        "caption_ids": jnp.asarray(rng.randint(0, 63, (bs, 8)).astype(np.int32)),
        "uncond_ids": jnp.asarray(np.zeros((1, 8), np.int32)),
        "size": jnp.asarray(rng.rand(bs, 1).astype(np.float32) * 16),
    }


def test_train_step_runs_and_learns():
    engine = make_tiny_engine(use_ema=True)
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)

    step = jax.jit(engine.train_step)
    losses = []
    for _ in range(5):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))

    assert state.step == 5
    assert np.isfinite(losses).all()
    # same batch repeated: loss should drop
    assert losses[-1] < losses[0], losses
    # EMA tracked
    assert state.ema is not None and int(state.ema.num_updates) == 5


def test_log_images_and_sampling():
    from neurosis_tpu.diffusion import LegacyDDPMDiscretization
    from neurosis_tpu.sampling import EulerEDMSampler, VanillaCFG

    engine = make_tiny_engine()
    engine.sampler = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(),
        guider=VanillaCFG(scale=3.0),
        num_steps=3,
    )
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)

    log = engine.log_images(
        state.params, frozen, batch, num_img=2, captions=["a", "b"], rng=jax.random.PRNGKey(1)
    )
    assert log["inputs"].shape == (2, 16, 16, 3)
    assert log["reconstructions"].shape == (2, 16, 16, 3)
    assert log["samples"].shape == (2, 16, 16, 3)
    assert np.isfinite(log["samples"]).all()
    assert log["conditioning"].shape[0] == 2


def test_sampling_program_cached_across_log_calls():
    """Repeat log_images must reuse the jitted sampling program (one cache
    entry per (shape, num_steps)) instead of re-tracing the UNet."""
    from neurosis_tpu.diffusion import LegacyDDPMDiscretization
    from neurosis_tpu.sampling import EulerEDMSampler, VanillaCFG

    engine = make_tiny_engine()
    engine.sampler = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(), guider=VanillaCFG(scale=3.0), num_steps=2
    )
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)

    engine.log_images(state.params, frozen, batch, num_img=2, rng=jax.random.PRNGKey(1))
    assert len(engine._sample_cache) == 1
    fn = next(iter(engine._sample_cache.values()))
    engine.log_images(state.params, frozen, batch, num_img=2, rng=jax.random.PRNGKey(2))
    assert len(engine._sample_cache) == 1
    assert next(iter(engine._sample_cache.values())) is fn
