"""Small-parity sweep: ActNorm, VAE make_attn variants, pil_crop_random,
pil_pad_square, collate_dict_lists (reference symbols with no prior analog)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_actnorm_data_dependent_init():
    """ActNorm (modules/layers.py:10-86): first-batch init makes output
    zero-mean/unit-std per channel; reverse inverts; logdet shape."""
    from neurosis_tpu.losses.patchgan import ActNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6, 6, 4).astype(np.float32) * 3.0 + 1.5)

    an = ActNorm()
    out, variables = an.init_with_output(jax.random.PRNGKey(0), x)
    m = np.asarray(jnp.mean(out, axis=(0, 1, 2)))
    s = np.asarray(jnp.std(out, axis=(0, 1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-4)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)

    # reverse round-trips
    back = an.apply(variables, out, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-4)

    # 2-D input path
    x2 = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    out2, v2 = ActNorm().init_with_output(jax.random.PRNGKey(0), x2)
    assert out2.shape == (8, 4)

    # logdet: height*width*sum(log|scale|) per batch element
    outl, vl = ActNorm(logdet=True).init_with_output(jax.random.PRNGKey(0), x)
    h, ld = outl
    assert ld.shape == (8,)
    expect = 6 * 6 * np.sum(np.log(np.abs(np.asarray(vl["params"]["scale"]))))
    np.testing.assert_allclose(np.asarray(ld), expect, rtol=1e-5)


def test_patchgan_actnorm_option():
    from neurosis_tpu.losses.patchgan import NLayerDiscriminator

    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2, use_actnorm=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    out, variables = disc.init_with_output(jax.random.PRNGKey(0), x)
    assert out.ndim == 4 and out.shape[-1] == 1
    assert "batch_stats" not in variables  # ActNorm replaces BatchNorm


def test_make_attn_variants():
    from neurosis_tpu.models.vae import LinAttnBlock, VAEAttnBlock, make_attn

    assert isinstance(make_attn(32, "vanilla"), VAEAttnBlock)
    assert isinstance(make_attn(32, "linear"), LinAttnBlock)
    x = jnp.ones((1, 4, 4, 32))
    assert make_attn(32, "none")(x) is x
    with pytest.raises(ValueError):
        make_attn(32, "bogus")

    lin = LinAttnBlock(32)
    out, _ = lin.init_with_output(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape


def test_pil_crop_random():
    from PIL import Image

    from neurosis_tpu.data.utils import pil_crop_random

    rng = np.random.default_rng(0)
    # big image: downscaled to ≤2x target then cropped
    big = Image.fromarray((np.random.RandomState(0).rand(300, 400, 3) * 255).astype("uint8"))
    img, (top, left) = pil_crop_random(big, 64, rng=rng)
    assert img.size == (64, 64)
    # cover-resized frame is ~171x128 → crop offsets within its margins
    assert 0 <= top <= 64 and 0 <= left <= 107

    # small image: upscaled to cover
    small = Image.fromarray((np.random.RandomState(1).rand(20, 30, 3) * 255).astype("uint8"))
    img, _ = pil_crop_random(small, 64, rng=rng)
    assert img.size == (64, 64)

    # exact size: identity
    exact = Image.fromarray((np.random.RandomState(2).rand(64, 64, 3) * 255).astype("uint8"))
    img, crop = pil_crop_random(exact, 64, rng=rng)
    assert img.size == (64, 64) and crop == (0, 0)


def test_pil_pad_square():
    from PIL import Image

    from neurosis_tpu.utils.image import pil_pad_square

    img = Image.fromarray((np.random.RandomState(0).rand(40, 100, 3) * 255).astype("uint8"))
    out = pil_pad_square(img)
    assert out.size == (100, 100)
    # original centered; corners are the fill color
    assert out.getpixel((0, 0)) == (255, 255, 255)
    assert out.getpixel((50, 50)) != (255, 255, 255)


def test_collate_dict_lists():
    from neurosis_tpu.data.utils import collate_dict_lists

    samples = [
        {"image": np.ones((4, 4, 3), np.float32) * i, "caption": f"c{i}", "meta": (i, i)}
        for i in range(3)
    ]
    out = collate_dict_lists(samples)
    assert out["image"].shape == (3, 4, 4, 3)
    assert out["caption"] == ["c0", "c1", "c2"]
    assert out["meta"] == [(0, 0), (1, 1), (2, 2)]


def test_np_text_decode_and_maybe_collect():
    from neurosis_tpu.utils.misc import maybe_collect, np_text_decode

    assert np_text_decode(np.bytes_(b"hello")) == "hello"
    assert np_text_decode([b"a", "b"]) == ["a", "b"]
    assert np_text_decode("x", aslist=True) == ["x"]
    maybe_collect(0.0)  # always collects; must not raise
    maybe_collect(101.0)  # never collects


def test_class_embedder_multicond():
    from neurosis_tpu.modules.encoders.misc import ClassEmbedderForMultiCond

    m = ClassEmbedderForMultiCond(embed_dim=8, n_classes=10)
    c = jnp.asarray([1, 2, 3])
    (out,), _ = m.init_with_output(jax.random.PRNGKey(0), [c])
    (out2,), _ = m.init_with_output(jax.random.PRNGKey(0), c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_wrap_caption_and_grid():
    from PIL import Image, ImageDraw

    from neurosis_tpu.utils.image import caption_grid, wrap_caption

    draw = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    from neurosis_tpu.utils.image import _default_font

    font = _default_font()
    long = "a much longer caption that definitely needs to wrap across lines"
    lines = wrap_caption(long, font, 60, draw)
    assert len(lines) > 1
    assert lines[-1].endswith("…") or sum(len(l.split()) for l in lines) == len(long.split())

    imgs = [Image.new("RGB", (64, 64)) for _ in range(2)]
    g = caption_grid(imgs, captions=[long, "short"])
    assert g.width > 64 and g.height > 64


def test_per_level_remat_policies_grads_match():
    """Per-level remat tuples (the bench/prod default none,none,dots_names)
    give identical grads to full remat."""
    from neurosis_tpu.models.unet import UNetModel

    def build(policy, ckpt=True):
        return UNetModel(
            in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=[4, 2], channel_mult=[1, 2, 4], num_heads=2,
            transformer_depth=[1, 1, 1], context_dim=32,
            use_checkpoint=ckpt, remat_policy=policy,
        )

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4), jnp.float32)
    t = jnp.ones((1,), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 7, 32), jnp.float32)

    ref_model = build("full")
    params = ref_model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    def grads_of(model):
        def loss(p):
            return jnp.sum(model.apply({"params": p}, x, t, ctx) ** 2)

        g = jax.grad(loss)(params)
        return np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g)])

    ref = grads_of(ref_model)
    for policy in [("none", "none", "dots_names"), ("names", "dots_all", "full")]:
        got = grads_of(build(policy))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
