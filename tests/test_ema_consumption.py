"""EMA consumption parity (VERDICT r2 #1/#2/#7/#8).

The reference swaps EMA params in for every sampling/eval pass (ema_scope —
models/diffusion.py:247-257, 410-415; autoencoder.py:264-301) and exports the
shadows as mangled `model_ema.*` buffers (modules/ema.py:24-29). These tests
prove our framework actually CONSUMES the trained EMA:

  - eval_step reports *_ema metrics that differ from raw once params drift;
  - eval_params (ema_scope) produces different samples than raw params;
  - the sgm safetensors roundtrip preserves `model_ema.*` keys bit-exactly;
  - the ImageLogger samples under the EMA scope;
  - the VAE engine logs recon/diff(+_ema)/disc-logit grids;
  - silent-degrader guards: tokenizer fallback + random-weight validate.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.test_engine_smoke import make_batch, make_tiny_engine  # noqa: E402


def _trained_state(engine, batch, steps=4):
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(engine.train_step)
    for _ in range(steps):
        state, _ = step(state, frozen, batch)
    return state, frozen


def test_eval_step_reports_ema_metrics():
    engine = make_tiny_engine(use_ema=True)
    batch = make_batch()
    state, frozen = _trained_state(engine, batch)

    _, metrics = jax.jit(engine.eval_step)(state, frozen, batch)
    assert "loss_ema" in metrics
    # EMA shadows lag the live params after a few steps on a fresh model —
    # identical values would mean the EMA scope is a no-op
    assert float(metrics["loss"]) != pytest.approx(float(metrics["loss_ema"]), abs=1e-7)


def test_eval_params_is_ema_scope():
    engine = make_tiny_engine(use_ema=True)
    batch = make_batch()
    state, frozen = _trained_state(engine, batch)

    ema_params = engine.eval_params(state)
    raw = jax.tree_util.tree_leaves(state.params["model"])[0]
    ema = jax.tree_util.tree_leaves(ema_params["model"])[0]
    assert raw.dtype == ema.dtype  # cast back to live dtype (LitEma.copy_to)
    assert not np.allclose(np.asarray(raw), np.asarray(ema))

    # without use_ema, eval_params is the identity
    engine_raw = make_tiny_engine(use_ema=False)
    state_raw, _ = engine_raw.init(jax.random.PRNGKey(0), batch)
    assert engine_raw.eval_params(state_raw) is state_raw.params


def test_sampling_differs_raw_vs_ema():
    from neurosis_tpu.diffusion import LegacyDDPMDiscretization
    from neurosis_tpu.sampling import EulerEDMSampler, VanillaCFG

    engine = make_tiny_engine(use_ema=True)
    engine.sampler = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(), guider=VanillaCFG(scale=3.0), num_steps=2
    )
    batch = make_batch()
    state, frozen = _trained_state(engine, batch)

    prepped = {k: v for k, v in batch.items()}
    cond_vars = {"params": engine._merged_cond_params(state.params, frozen)}
    c, uc = engine.conditioner.get_unconditional_conditioning(cond_vars, prepped)
    shape = (2, 2, 2, 4)
    s_raw = engine.sample(state.params, frozen, c, uc, jax.random.PRNGKey(7), shape)
    s_ema = engine.sample(engine.eval_params(state), frozen, c, uc, jax.random.PRNGKey(7), shape)
    assert not np.allclose(np.asarray(s_raw), np.asarray(s_ema))


def test_sgm_roundtrip_preserves_model_ema(tmp_path):
    from neurosis_tpu.checkpoint.sgm import (
        export_sgm_checkpoint,
        load_sgm_checkpoint,
        load_state_dict,
    )

    engine = make_tiny_engine(use_ema=True)
    batch = make_batch()
    state, frozen = _trained_state(engine, batch)

    path = tmp_path / "ckpt.safetensors"
    export_sgm_checkpoint(engine, state, frozen, path)

    sd = load_state_dict(path)
    ema_keys = [k for k in sd if k.startswith("model_ema.")]
    assert "model_ema.decay" in sd and "model_ema.num_updates" in sd
    # every UNet param has a mangled shadow buffer (ema.py:24-29 semantics)
    n_unet = len([k for k in sd if k.startswith("model.diffusion_model.")])
    assert len(ema_keys) == n_unet + 2
    assert all("." not in k[len("model_ema."):] for k in ema_keys)
    assert int(sd["model_ema.num_updates"]) == int(state.ema.num_updates)

    # import into a freshly-initialized engine: shadows restored bit-exactly
    state2, frozen2 = engine.init(jax.random.PRNGKey(1), batch)
    state2, frozen2 = load_sgm_checkpoint(engine, state2, frozen2, path)
    got = jax.tree_util.tree_leaves(state2.ema.params["model"])
    want = jax.tree_util.tree_leaves(state.ema.params["model"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=0, atol=0)
    assert int(state2.ema.num_updates) == int(state.ema.num_updates)


def test_image_logger_samples_with_ema(tmp_path, monkeypatch):
    """ImageLogger must route sampling through engine.eval_params (the EMA
    scope) — models/diffusion.py:413."""
    from neurosis_tpu.diffusion import LegacyDDPMDiscretization
    from neurosis_tpu.sampling import EulerEDMSampler, VanillaCFG
    from neurosis_tpu.trainer.callbacks import ImageLogger

    engine = make_tiny_engine(use_ema=True)
    engine.sampler = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(), guider=VanillaCFG(scale=3.0), num_steps=2
    )
    batch = make_batch()
    state, frozen = _trained_state(engine, batch)

    seen = {}
    real_eval_params = engine.eval_params

    def spy_eval_params(st):
        seen["called"] = True
        return real_eval_params(st)

    monkeypatch.setattr(engine, "eval_params", spy_eval_params, raising=False)

    class FakeTrainer:
        root_dir = tmp_path
        caption_key = "caption"
        batch_idx = 0
        epoch = 0

        class logger:
            wandb = None

        def __init__(self, engine):
            self.engine = engine

        def prepare_batch(self, b):
            return {k: np.asarray(v) for k, v in b.items()}

    il = ImageLogger(every_n_train_steps=1, max_images=2)
    il.on_train_batch_end(FakeTrainer(engine), state, frozen, batch, {}, step=2)
    assert seen.get("called"), "ImageLogger sampled without the EMA scope"
    pngs = list((tmp_path / "images" / "train").glob("*.png"))
    assert any("samples" in p.name for p in pngs) and any("inputs" in p.name for p in pngs)


def _tiny_vae_engine(use_ema=True):
    from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr
    from neurosis_tpu.models.vae import Decoder, Encoder
    from neurosis_tpu.trainer.vae_engine import AutoencodingEngine

    return AutoencodingEngine(
        encoder=Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        decoder=Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        loss=AutoencoderLPIPSWithDiscr(perceptual_weight=0.1, disc_start=1, disc_n_layers=1),
        g_optimizer=optax.adam(1e-3),
        d_optimizer=optax.adam(1e-3),
        kl_weight=1e-6,
        disc_start=1,
        use_ema=use_ema,
    )


def test_vae_log_images_and_ema(tmp_path):
    engine = _tiny_vae_engine()
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)}
    state = engine.init(jax.random.PRNGKey(0), batch)
    g_step = jax.jit(engine.g_step)
    for _ in range(3):
        state, _ = g_step(state, batch)

    log = engine.log_images(state, batch, num_img=2)
    for key in ("inputs", "reconstructions", "diff", "diff_boost",
                "reconstructions_ema", "diff_ema", "diff_boost_ema"):
        assert key in log, key
        assert np.isfinite(log[key]).all()
    assert log["reconstructions"].shape == (2, 32, 32, 3)
    # diff maps live in [-1, 1] (autoencoder.py:386-394 scaling)
    assert log["diff"].min() >= -1.0 - 1e-6 and log["diff"].max() <= 1.0 + 1e-6
    # EMA recon differs from raw after a few steps
    assert not np.allclose(log["reconstructions"], log["reconstructions_ema"])
    # discriminator-logit grids (vae_lpips_discr.py:202-309)
    assert "vis_logits" in log and "vis_logits_blended" in log
    assert log["vis_logits"].shape[0] == 1 and log["vis_logits"].shape[-1] == 3

    # VAE eval_step: val metrics + _ema twins
    _, metrics = jax.jit(engine.eval_step)(state, batch)
    assert any(k.startswith("val/") for k in metrics)
    assert any(k.endswith("_ema") for k in metrics)


def test_image_logger_drives_vae_engine(tmp_path):
    """A VAE training run must produce recon images (VERDICT r2 missing #2)."""
    from neurosis_tpu.trainer.callbacks import ImageLogger

    engine = _tiny_vae_engine()
    rng = np.random.RandomState(0)
    batch = {"image": rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5}
    state = engine.init(jax.random.PRNGKey(0), {"image": jnp.asarray(batch["image"])})

    class FakeTrainer:
        root_dir = tmp_path
        caption_key = "caption"
        batch_idx = 3
        epoch = 1

        class logger:
            wandb = None

        def __init__(self, engine):
            self.engine = engine

        def prepare_batch(self, b):
            return {k: np.asarray(v) for k, v in b.items()}

    il = ImageLogger(every_n_train_steps=2, max_images=2)
    il.on_train_batch_end(FakeTrainer(engine), state, {}, batch, {}, step=4)
    pngs = [p.name for p in (tmp_path / "images" / "train").glob("*.png")]
    assert any("reconstructions" in n for n in pngs), pngs
    assert any("diff_boost" in n for n in pngs), pngs
    assert any("vis_logits" in n for n in pngs), pngs
    assert any(n.startswith("gs000004_e0001_b000003") for n in pngs), pngs


def test_image_logger_cadence():
    """check_step_idx parity (image_logger.py:98-126)."""
    from neurosis_tpu.trainer.callbacks import ImageLogger, StepType

    il = ImageLogger(every_n_train_steps=10, log_first_step=True)
    assert il.check_step_idx(1, 0) is True  # log_first_step
    assert il.check_step_idx(5, 0) is False
    assert il.check_step_idx(10, 0) is True
    il._last_logged = 10
    assert il.check_step_idx(10, 0) is False  # never the same step twice
    assert il.check_step_idx(20, 0) is True

    il2 = ImageLogger(every_n_train_steps=4, log_step_type=StepType.batch_idx)
    assert il2.get_step_idx(99, 8) == 8
    assert il2.check_step_idx(99, 8) is True
    il3 = ImageLogger(
        every_n_train_steps=8, log_step_type=StepType.sample_idx, batch_size=2,
        accumulate_grad_batches=2,
    )
    assert il3.get_step_idx(0, 2) == 8
    assert il3.check_step_idx(0, 2) is True

    il4 = ImageLogger(every_n_train_steps=10, log_before_start=True)
    assert il4.check_step_idx(0, 0, before_start=True) is True
    il5 = ImageLogger(every_n_train_steps=10)
    assert il5.check_step_idx(0, 0, before_start=True) is False


def test_tokenizer_fallback_requires_opt_in(monkeypatch, tmp_path):
    from neurosis_tpu.trainer.loop import HashTokenizer, get_tokenizer

    monkeypatch.delenv("NEUROSIS_ALLOW_HASH_TOKENIZER", raising=False)
    with pytest.raises(FileNotFoundError, match="de-CLIP"):
        get_tokenizer(version=str(tmp_path / "nonexistent"))
    assert isinstance(
        get_tokenizer(version=str(tmp_path / "nonexistent"), allow_fallback=True), HashTokenizer
    )
    monkeypatch.setenv("NEUROSIS_ALLOW_HASH_TOKENIZER", "1")
    assert isinstance(get_tokenizer(version=str(tmp_path / "nonexistent")), HashTokenizer)


def test_validate_refuses_random_weights(tmp_path):
    from neurosis_tpu.trainer.loop import HashTokenizer, Trainer

    engine = make_tiny_engine()
    trainer = Trainer(
        engine, max_steps=1, default_root_dir=str(tmp_path), tokenizer=HashTokenizer(max_length=8)
    )

    def batches():
        yield {
            "image": np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32),
            "caption": ["a", "b"],
            "size": np.ones((2, 1), np.float32),
        }

    with pytest.raises(RuntimeError, match="randomly-initialized"):
        trainer.validate(batches, max_batches=1)

    trainer.allow_random_weights = True
    metrics = trainer.validate(batches, max_batches=1)
    assert "loss" in metrics
