"""DINOv2 builder + checkpoint-import contract (data/dinov2/acquire.py:26-120).

Builds a synthetic checkpoint with the official facebookresearch/dinov2 key
layout (fused qkv, ls1/ls2 gammas, register tokens, mask_token) and checks
create_dinov2 imports it cleanly, interpolates the 37²-grid positional
embeddings for 224px inputs, and runs all token outputs finite.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.models.dinov2 import (  # noqa: E402
    DinoV2Config,
    DinoVisionTransformer,
    create_dinov2,
)


def _official_sd(dim, depth, heads, n_reg, img=518, patch=14, seed=0):
    """Random state dict in the official dinov2 checkpoint layout."""
    rng = np.random.RandomState(seed)
    n = (img // patch) ** 2
    sd = {
        "cls_token": rng.randn(1, 1, dim).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, n + 1, dim).astype(np.float32) * 0.02,
        "mask_token": rng.randn(1, dim).astype(np.float32) * 0.02,
        "patch_embed.proj.weight": rng.randn(dim, 3, patch, patch).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(dim, np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    if n_reg:
        sd["register_tokens"] = rng.randn(1, n_reg, dim).astype(np.float32) * 0.02
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32) * 0.02
        sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32) * 0.02
        sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.ls1.gamma"] = np.full(dim, 1.0, np.float32)
        sd[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32) * 0.02
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32) * 0.02
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.ls2.gamma"] = np.full(dim, 1.0, np.float32)
    return sd


def test_create_dinov2_imports_official_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    # vits14_reg geometry (registered variant exercises register tokens +
    # antialias pos-embed interpolation)
    sd = _official_sd(dim=384, depth=12, heads=6, n_reg=4)
    ckpt = tmp_path / "dinov2_vits14_reg.safetensors"
    save_file(sd, str(ckpt))

    model, params = create_dinov2(DinoV2Config.SmallRegistered, ckpt_path=str(ckpt))
    assert params is not None
    # all shipped keys consumed except mask_token (inference-unused)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 224, 224, 3).astype(np.float32))
    out = jax.jit(model.apply)({"params": params}, x)
    assert out["x_norm_clstoken"].shape == (2, 384)
    assert out["x_norm_regtokens"].shape == (2, 4, 384)
    assert out["x_norm_patchtokens"].shape == (2, 256, 384)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_create_dinov2_default_dir_and_missing(tmp_path):
    # no weights anywhere → default init, params None (acquire.py:113-118)
    model, params = create_dinov2("dinov2_vits14", data_dir=str(tmp_path))
    assert params is None
    assert model.num_register_tokens == 0 and model.interpolate_offset == 0.1


def test_dinov2_swiglu_giant_block():
    """giant2 uses the fused SwiGLU FFN — tiny-dim smoke of that path."""
    m = DinoVisionTransformer(
        embed_dim=32, depth=2, heads=4, ffn_layer="swiglufused", img_size=56, patch_size=14
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["x_norm_patchtokens"].shape == (1, 16, 32)
    # fused w12 present with the round-to-8 hidden size: 2/3*128 -> 88
    assert params["blocks.0"]["mlp.w12"]["kernel"].shape == (32, 2 * 88)
