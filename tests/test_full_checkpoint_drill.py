"""Full reference-layout checkpoint drill (VERDICT r2 next #5).

One complete SDXL-shaped state dict — UNet + conditioner.embedders.* +
first_stage_model.* + mangled `model_ema.*` — through the single
init_from_ckpt-equivalent path (models/diffusion.py:127-144 semantics), with
zero missing/unexpected accounting and forward equivalence vs the source
engine. Real weights aren't in the image; the key-LAYOUT is the thing being
de-risked, so the dict is synthesized by exporting a trained tiny engine."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")



from tests.test_engine_smoke import make_batch, make_tiny_engine  # noqa: E402


def _engine_with_first_stage(use_ema=True):
    from neurosis_tpu.models.autoencoder import AutoencoderKL

    engine = make_tiny_engine(use_vae=False, use_ema=use_ema)
    engine.first_stage = AutoencoderKL(
        ddconfig=dict(
            ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=16,
            z_channels=4, double_z=True,
        ),
        embed_dim=4,
    )
    return engine


def test_full_checkpoint_drill(tmp_path):
    from neurosis_tpu.checkpoint.sgm import export_sgm_checkpoint, load_sgm_checkpoint, load_state_dict

    engine = _engine_with_first_stage()
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(engine.train_step)
    for _ in range(2):
        state, _ = step(state, frozen, batch)

    path = tmp_path / "full.safetensors"
    export_sgm_checkpoint(engine, state, frozen, path)

    # -- reference key layout (models/diffusion.py:127-144 + ema.py:24-29) --
    sd = load_state_dict(path)
    assert any(k.startswith("model.diffusion_model.input_blocks.") for k in sd)
    assert any(k.startswith("model.diffusion_model.output_blocks.") for k in sd)
    assert any(k.startswith("conditioner.embedders.0.") for k in sd)
    assert any(k.startswith("first_stage_model.encoder.") for k in sd)
    assert any(k.startswith("first_stage_model.decoder.") for k in sd)
    assert "first_stage_model.quant_conv.weight" in sd
    assert any(k.startswith("model_ema.diffusion_model_") for k in sd)
    # mangled buffer names are '.'-free after the prefix (ema.py:24-29)
    assert all("." not in k[len("model_ema."):] for k in sd if k.startswith("model_ema."))

    # -- single-call import with full accounting --
    engine2 = _engine_with_first_stage()
    state2, frozen2 = engine2.init(jax.random.PRNGKey(99), batch)
    state2, frozen2, report = load_sgm_checkpoint(engine2, state2, frozen2, path, with_report=True)
    assert report["missing"] == [], report["missing"][:5]
    assert report["unexpected"] == [], report["unexpected"][:5]

    # -- forward equivalence vs the source engine --
    r = jax.random.PRNGKey(7)
    loss1 = jax.jit(engine.eval_step)(state, frozen, batch)[1]
    loss2 = jax.jit(engine2.eval_step)(state2._replace(rng=state.rng), frozen2, batch)[1]
    np.testing.assert_allclose(float(loss1["loss"]), float(loss2["loss"]), rtol=1e-5)
    # EMA shadows survived the mangled roundtrip: the _ema metrics agree too
    np.testing.assert_allclose(float(loss1["loss_ema"]), float(loss2["loss_ema"]), rtol=1e-5)


def test_drill_flags_unexpected_and_missing(tmp_path):
    """strict=False accounting: stray keys and absent components are reported,
    not raised (init_from_ckpt missing/unexpected print parity)."""
    from neurosis_tpu.checkpoint.sgm import export_sgm_checkpoint, load_sgm_checkpoint

    engine = _engine_with_first_stage(use_ema=False)
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)
    path = tmp_path / "full.safetensors"
    export_sgm_checkpoint(engine, state, frozen, path)

    # corrupt: add a stray key, drop a UNet key
    from safetensors.numpy import load_file, save_file

    sd = dict(load_file(str(path)))
    dropped = next(k for k in sd if k.startswith("model.diffusion_model."))
    sd.pop(dropped)
    sd["totally.unknown.key"] = np.zeros(3, np.float32)
    save_file(sd, str(path))

    state2, frozen2 = engine.init(jax.random.PRNGKey(1), batch)
    _, _, report = load_sgm_checkpoint(engine, state2, frozen2, path, with_report=True)
    assert dropped in report["missing"]
    assert "totally.unknown.key" in report["unexpected"]
