"""int8 input path: uint8 batches == float32 batches through both engines.

The reference normalizes on the host (dataset/base.py:25-49); the TPU path
may ship uint8 and dequantize in-graph (ops/dequant.py). Same pixels must
produce the same losses either way.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.ops.dequant import dequant_image  # noqa: E402


def test_dequant_matches_host_normalize():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    host = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    dev = dequant_image(jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-7)
    # float passthrough
    f = jnp.asarray(host)
    assert dequant_image(f) is f


def test_engine_uint8_batch_matches_f32():
    from test_engine_smoke import make_tiny_engine

    engine = make_tiny_engine()
    rng = np.random.RandomState(0)
    u8 = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    base = {
        "caption_ids": rng.randint(0, 63, (2, 8)).astype(np.int32),
        "uncond_ids": np.zeros((1, 8), np.int32),
        "size": (rng.rand(2, 1) * 16).astype(np.float32),
    }
    b_u8 = dict(base, image=jnp.asarray(u8))
    b_f32 = dict(base, image=jnp.asarray(u8.astype(np.float32) * (2 / 255) - 1))

    state, frozen = engine.init(jax.random.PRNGKey(0), b_f32)
    s1, m1 = jax.jit(engine.train_step)(state, frozen, b_f32)
    s2, m2 = jax.jit(engine.train_step)(state, frozen, b_u8)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)


def test_vae_engine_uint8_batch_matches_f32():
    import optax

    from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr
    from neurosis_tpu.models.vae import Decoder, Encoder
    from neurosis_tpu.trainer.vae_engine import AutoencodingEngine

    engine = AutoencodingEngine(
        encoder=Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        decoder=Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=32, z_channels=2),
        loss=AutoencoderLPIPSWithDiscr(perceptual_weight=0.1, disc_start=1, disc_n_layers=1),
        g_optimizer=optax.adam(1e-3),
        d_optimizer=optax.adam(1e-3),
        kl_weight=1e-6,
        disc_start=1,
    )
    rng = np.random.RandomState(0)
    u8 = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    b_u8 = {"image": jnp.asarray(u8)}
    b_f32 = {"image": jnp.asarray(u8.astype(np.float32) * (2 / 255) - 1)}

    state = engine.init(jax.random.PRNGKey(0), b_f32)
    _, m1 = jax.jit(engine.g_step)(state, b_f32)
    _, m2 = jax.jit(engine.g_step)(state, b_u8)
    np.testing.assert_allclose(float(m2["total"]), float(m1["total"]), rtol=1e-5)


def test_imagefolder_uint8_mode(tmp_path):
    from PIL import Image

    from neurosis_tpu.data.imagefolder import FolderVAEDataset

    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(tmp_path / f"{i}.png")
        (tmp_path / f"{i}.txt").write_text("caption")

    ds8 = FolderVAEDataset(folder=str(tmp_path), resolution=32, batch_size=2, image_dtype="uint8")
    dsf = FolderVAEDataset(folder=str(tmp_path), resolution=32, batch_size=2)
    b8 = ds8.get_batch([0, 1])["image"]
    bf = dsf.get_batch([0, 1])["image"]
    assert b8.dtype == np.uint8 and bf.dtype == np.float32
    np.testing.assert_allclose(b8.astype(np.float32) * (2 / 255) - 1, bf, atol=1e-6)
