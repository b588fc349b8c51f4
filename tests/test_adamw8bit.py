"""8-bit AdamW (optimizers/adamw8bit.py): quantizer accuracy, Adam-trajectory
closeness to fp32, state dtypes/memory, and registry dispatch.

Parity target: bitsandbytes.optim.AdamW8bit selected by class_path in the
reference configs (configs/sdxl/sdxl-te.example.yaml) — blockwise 8-bit
moment state with fp32 fallback for small tensors.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurosis_tpu.optimizers.adamw8bit import (  # noqa: E402
    Quantized8bit,
    _dequantize_signed,
    _dequantize_unsigned,
    _quantize_signed,
    _quantize_unsigned,
    adamw8bit,
)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 1.0, 1e3])
def test_signed_roundtrip_relative_error(scale):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4096).astype(np.float32) * scale)
    q = _quantize_signed(x, 256)
    y = _dequantize_signed(q, x.size, x.shape)
    rel = np.abs(np.asarray(y) - np.asarray(x)) / np.maximum(np.abs(np.asarray(x)), 1e-30)
    # log codebook: 7 decades over 126 steps → max half-step rel error ~6.6%;
    # values >7 decades below the block absmax collapse to 0 (excluded)
    big = np.abs(np.asarray(x)) > np.asarray(q.scale).max() * 1e-6
    assert float(np.max(rel[big])) < 0.07


@pytest.mark.parametrize("scale", [1e-8, 1e-2, 10.0])
def test_unsigned_roundtrip_relative_error(scale):
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.rand(4096).astype(np.float32) + 1e-4) * scale)
    q = _quantize_unsigned(x, 256)
    y = _dequantize_unsigned(q, x.size, x.shape)
    rel = np.abs(np.asarray(y) - np.asarray(x)) / np.asarray(x)
    assert float(np.max(rel)) < 0.05  # 10 decades / 254 steps → ~4.6% half-step


def test_zero_and_padding():
    x = jnp.zeros((300,), jnp.float32)  # needs padding to 2 blocks of 256
    q = _quantize_signed(x, 256)
    assert q.codes.shape == (2, 256)
    y = _dequantize_signed(q, 300, (300,))
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_state_is_8bit_for_big_leaves_fp32_for_small():
    params = {
        "big": jnp.ones((64, 128), jnp.float32),  # 8192 ≥ min_8bit_size
        "small": jnp.ones((16,), jnp.float32),
    }
    opt = adamw8bit(1e-3)
    state = opt.init(params)
    adam_state = state[0]
    assert isinstance(adam_state.mu["big"], Quantized8bit)
    assert adam_state.mu["big"].codes.dtype == jnp.int8
    assert adam_state.nu["big"].codes.dtype == jnp.int8
    assert adam_state.mu["small"].dtype == jnp.float32
    # ~16.25 bits/param of moment state for the big leaf
    nbytes = adam_state.mu["big"].codes.nbytes + adam_state.mu["big"].scale.nbytes
    assert nbytes <= params["big"].size * 1.1  # ≈1.016 bytes/param


def test_matches_fp32_adamw_trajectory():
    """50 steps on a noisy quadratic: 8-bit tracks fp32 AdamW closely."""
    rng = np.random.RandomState(2)
    target = jnp.asarray(rng.randn(128, 64).astype(np.float32))
    p0 = {"w": jnp.zeros((128, 64), jnp.float32)}

    def loss_fn(p, key):
        noise = jax.random.normal(key, target.shape) * 0.01
        return jnp.mean(jnp.square(p["w"] - target + noise))

    def run(opt):
        p = p0
        state = opt.init(p)

        @jax.jit
        def step(p, state, key):
            loss, g = jax.value_and_grad(loss_fn)(p, key)
            u, state = opt.update(g, state, p)
            return optax.apply_updates(p, u), state, loss

        losses = []
        for i in range(50):
            p, state, loss = step(p, state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        return p, losses

    p8, l8 = run(adamw8bit(3e-2, weight_decay=1e-3, min_8bit_size=1024))
    p32, l32 = run(optax.adamw(3e-2, weight_decay=1e-3))

    assert l8[-1] < 0.25 * l8[0], "8-bit AdamW failed to optimize"
    # final params close to the fp32 run (quantization noise bounded)
    diff = float(jnp.mean(jnp.abs(p8["w"] - p32["w"])))
    ref = float(jnp.mean(jnp.abs(p32["w"] - p0["w"])))
    assert diff < 0.05 * ref, (diff, ref)


def test_registry_dispatch():
    from neurosis_tpu.config.registry import resolve_class_path

    fn = resolve_class_path("bitsandbytes.optim.AdamW8bit")
    opt = fn(1e-3)
    p = {"w": jnp.ones((4096,), jnp.float32)}
    state = opt.init(p)
    g = {"w": jnp.full((4096,), 0.1, jnp.float32)}
    u, _ = opt.update(g, state, p)
    assert np.all(np.isfinite(np.asarray(u["w"])))
