"""Pallas implicit-GEMM 3x3 conv vs XLA conv (interpret mode on CPU)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

os.environ.setdefault("NEUROSIS_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("c,f,h,w", [(128, 256, 16, 128), (256, 128, 8, 128)])
def test_conv3x3_fwd_bwd_parity(c, f, h, w):
    import neurosis_tpu.ops.conv3x3 as m

    assert m._INTERPRET or jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32), jnp.bfloat16)
    wt = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32) * 0.05, jnp.bfloat16)

    got = m.conv3x3(x, wt).astype(jnp.float32)
    want = m._xla_conv(x, wt).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want)))
    assert float(jnp.max(jnp.abs(got - want))) / scale < 5e-3  # bf16 noise

    gp = jax.grad(lambda x, w: jnp.sum(m.conv3x3(x, w).astype(jnp.float32) ** 2), argnums=(0, 1))(x, wt)
    gx = jax.grad(lambda x, w: jnp.sum(m._xla_conv(x, w).astype(jnp.float32) ** 2), argnums=(0, 1))(x, wt)
    for a, b in zip(gp, gx):
        sc = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) / sc < 5e-3


def test_conv3x3_supported_gate():
    from neurosis_tpu.ops.conv3x3 import conv3x3_supported

    ok = (1, 64, 64, 640)
    assert conv3x3_supported(ok, (3, 3, 640, 640), 1, 1, jnp.bfloat16)
    assert not conv3x3_supported(ok, (1, 1, 640, 640), 1, 0, jnp.bfloat16)  # 1x1
    assert not conv3x3_supported(ok, (3, 3, 640, 640), 2, 1, jnp.bfloat16)  # stride
    assert not conv3x3_supported(ok, (3, 3, 640, 640), 1, 1, jnp.float32)  # dtype
    assert not conv3x3_supported((1, 8, 8, 640), (3, 3, 640, 640), 1, 1, jnp.bfloat16)  # tiny
    # unaligned channels lose to XLA's emitter (A/B: padded 320 is -7%)
    assert not conv3x3_supported((1, 64, 64, 320), (3, 3, 320, 320), 1, 1, jnp.bfloat16)


def test_conv3x3_spatial_win_range_gate():
    """The Pallas conv must stay OFF above its measured win range: enabling
    it at VAE-encode scales regressed SDXL-VAE 1024px encode 307 → 156
    imgs/s (BASELINE round-3; knob attribution in NOTES)."""
    from neurosis_tpu.ops.conv3x3 import conv3x3_supported

    # UNet train shapes (measured wins) stay on
    assert conv3x3_supported((2, 64, 64, 640), (3, 3, 640, 640), 1, 1, jnp.bfloat16)
    assert conv3x3_supported((2, 32, 32, 1280), (3, 3, 1280, 1280), 1, 1, jnp.bfloat16)
    # VAE-encode spatial scales stay off
    for h in (1024, 512, 256, 128):
        assert not conv3x3_supported((8, h, h, 128), (3, 3, 128, 128), 1, 1, jnp.bfloat16), h


def test_conv2d_param_tree_stable():
    """The _RawConv refactor must keep the nn.Conv param layout
    (Conv_0/{kernel,bias}) so round-2 checkpoints and torch import remap
    stay valid."""
    from neurosis_tpu.modules.layers import Conv2d

    m = Conv2d(8, 3)
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)))
    assert set(v["params"].keys()) == {"Conv_0"}
    assert set(v["params"]["Conv_0"].keys()) == {"kernel", "bias"}
    assert v["params"]["Conv_0"]["kernel"].shape == (3, 3, 4, 8)
    # fp32 promotion with dtype=None (nn.Conv promote_dtype semantics)
    out = m.apply(v, jnp.ones((1, 8, 8, 4), jnp.bfloat16))
    assert out.dtype == jnp.float32
    out_bf = Conv2d(8, 3, dtype=jnp.bfloat16).apply(v, jnp.ones((1, 8, 8, 4), jnp.bfloat16))
    assert out_bf.dtype == jnp.bfloat16
