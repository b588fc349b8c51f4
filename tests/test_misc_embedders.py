"""Misc embedders + callbacks smoke coverage."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_class_embedder():
    from neurosis_tpu.modules.encoders.misc import ClassEmbedder

    emb = ClassEmbedder(embed_dim=16, n_classes=10, input_key="cls")
    v = emb.init(jax.random.PRNGKey(0), jnp.asarray([1, 2, 9]))  # 9 = ucg class
    # table is exactly n_classes rows (reference nn.Embedding(n_classes, dim))
    assert v["params"]["embedding"]["embedding"].shape == (10, 16)
    (out,) = emb.apply(v, jnp.asarray([1, 2, 9]))
    assert out.shape == (3, 16)
    assert emb.uncond_class() == 9  # classed.py:28-32


def test_spatial_rescaler():
    from neurosis_tpu.modules.encoders.misc import SpatialRescaler

    r = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=8, input_key="image")
    x = jnp.ones((2, 16, 16, 3))
    v = r.init(jax.random.PRNGKey(0), x)
    (out,) = r.apply(v, x)
    assert out.shape == (2, 4, 4, 8)


def test_lowscale_encoder_noise_levels():
    from neurosis_tpu.modules.encoders.misc import LowScaleEncoder

    enc = LowScaleEncoder(model=None, output_size=8, max_noise_level=100, input_key="image")
    x = jnp.ones((2, 16, 16, 3))
    v = enc.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    z, levels = enc.apply(v, x, rng=jax.random.PRNGKey(2))
    assert z.shape == (2, 8, 8, 3)
    assert levels.shape == (2,)
    assert (np.asarray(levels) < 100).all()


def test_save_config_callback(tmp_path):
    from neurosis_tpu.trainer.callbacks import SaveConfigCallback

    class _Logger:
        wandb = None

    class _Trainer:
        root_dir = tmp_path
        logger = _Logger()

    cb = SaveConfigCallback(config={"model": {"class_path": "x"}, "seed_everything": 1})
    cb.on_fit_start(_Trainer(), None)
    import yaml

    saved = yaml.safe_load((tmp_path / "config.yaml").read_text())
    assert saved["seed_everything"] == 1


def test_freeze_slice_transform():
    import optax

    from neurosis_tpu.utils.strings import freeze_slice

    tx = optax.chain(optax.sgd(1.0), freeze_slice("embedding", slice(0, 2)))
    params = {"embedding": jnp.ones((4, 3)), "dense": jnp.ones((2,))}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.abs(np.asarray(updates["embedding"][:2])).sum() == 0  # frozen rows
    assert np.abs(np.asarray(updates["embedding"][2:])).sum() > 0
    assert np.abs(np.asarray(updates["dense"])).sum() > 0


def test_alpha_blender():
    """AlphaBlender parity (modules/diffusion/util.py:237-286): fixed /
    learned / learned_with_images strategies."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neurosis_tpu.modules.layers import AlphaBlender

    xs, xt = jnp.ones((4, 3, 5)), jnp.zeros((4, 3, 5))

    out, _ = AlphaBlender(alpha=0.3, merge_strategy="fixed").init_with_output(
        jax.random.PRNGKey(0), xs, xt
    )
    np.testing.assert_allclose(np.asarray(out), 0.3, rtol=1e-6)

    out, v = AlphaBlender(alpha=0.0, merge_strategy="learned").init_with_output(
        jax.random.PRNGKey(0), xs, xt
    )
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)
    assert v["params"]["mix_factor"].shape == (1,)

    ind = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])  # (b=2, t=2) image-only flags
    out, _ = AlphaBlender(alpha=0.0, merge_strategy="learned_with_images").init_with_output(
        jax.random.PRNGKey(0), xs, xt, ind
    )
    expect = np.array([1.0, 0.5, 0.5, 1.0])[:, None, None] * np.ones((4, 3, 5))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)
