"""GeneralConditioner routing rules (embedding.py:59-149 contract)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.modules.encoders import (  # noqa: E402
    ConcatTimestepEmbedderND,
    FrozenCLIPEmbedder,
    GeneralConditioner,
    IdentityEncoder,
    with_embedder_names,
)
from neurosis_tpu.parallel.fsdp import fsdp_partition_spec  # noqa: E402


def _make(embedders):
    return GeneralConditioner(embedders=with_embedder_names(embedders))


def test_dim_routing_and_concat_order():
    cond = _make(
        [
            FrozenCLIPEmbedder(input_key="caption", layer="last", vocab_size=32, width=16, layers=1, heads=2, max_length=8),
            ConcatTimestepEmbedderND(outdim=16, input_key="size"),
            ConcatTimestepEmbedderND(outdim=16, input_key="crop"),
        ]
    )
    batch = {
        "caption_ids": jnp.zeros((2, 8), jnp.int32),
        "uncond_ids": jnp.zeros((1, 8), jnp.int32),
        "size": jnp.ones((2, 2)),
        "crop": jnp.zeros((2, 2)),
    }
    variables = cond.init(jax.random.PRNGKey(0), batch)
    out = cond.apply(variables, batch)
    # 3D → crossattn; 2D → vector, concatenated in embedder order
    assert out["crossattn"].shape == (2, 8, 16)
    assert out["vector"].shape == (2, 2 * 16 + 2 * 16)


def test_force_zero_embeddings():
    cond = _make([ConcatTimestepEmbedderND(outdim=8, input_key="size")])
    batch = {"size": jnp.ones((2, 1))}
    variables = cond.init(jax.random.PRNGKey(0), batch)
    out = cond.apply(variables, batch, force_zero_embeddings=("size",))
    assert float(jnp.abs(out["vector"]).sum()) == 0.0


def test_noncaption_ucg_zeroes_some_rows():
    cond = _make([ConcatTimestepEmbedderND(outdim=8, input_key="size", ucg_rate=0.5)])
    batch = {"size": jnp.ones((64, 1))}
    variables = cond.init(jax.random.PRNGKey(0), batch)
    out = cond.apply(variables, batch, rng=jax.random.PRNGKey(3))
    row_norms = np.asarray(jnp.abs(out["vector"]).sum(axis=1))
    zeroed = (row_norms == 0).mean()
    assert 0.2 < zeroed < 0.8  # ~Bernoulli(0.5)


def test_concat_key_for_4d():
    cond = _make([IdentityEncoder(input_key="lowres")])
    batch = {"lowres": jnp.ones((2, 4, 4, 3))}
    variables = cond.init(jax.random.PRNGKey(0), batch)
    out = cond.apply(variables, batch)
    assert out["concat"].shape == (2, 4, 4, 3)


def test_fsdp_partition_specs():
    from jax.sharding import PartitionSpec as P

    # big 2D: shard last axis when divisible
    assert fsdp_partition_spec((4096, 1024), 8) == P(None, "fsdp")
    # conv kernel: shard output features
    assert fsdp_partition_spec((3, 3, 320, 640), 8) == P(None, None, None, "fsdp")
    # small tensors stay replicated
    assert fsdp_partition_spec((320,), 8) == P()
    # indivisible: falls back to replicate
    assert fsdp_partition_spec((999, 1001), 8) == P()

def test_clip_t5_combo_embedder():
    """FrozenCLIPT5Encoder: two token streams -> two crossattn outputs
    concatenated on the feature axis (clip_t5.py:12-35 + KEY2CATDIM)."""
    from neurosis_tpu.modules.encoders import (
        FrozenCLIPT5Encoder,
        GeneralConditioner,
        with_embedder_names,
    )

    combo = FrozenCLIPT5Encoder(
        input_key="caption",
        clip_vocab_size=64, clip_width=32, clip_layers=1, clip_heads=2, clip_max_length=8,
        t5_vocab_size=64, t5_d_model=48, t5_d_kv=8, t5_d_ff=96, t5_num_layers=1,
        t5_num_heads=2, t5_max_length=8,
    )
    assert combo.token_keys() == ["caption_ids", "caption_t5_ids"]
    cond = GeneralConditioner(embedders=with_embedder_names([combo]))

    rng = np.random.RandomState(0)
    # reference semantics: both streams at the same max_length (77/77 there),
    # feature-axis concat of the two crossattn tensors
    batch = {
        "caption_ids": rng.randint(0, 63, (2, 8)).astype(np.int32),
        "caption_t5_ids": rng.randint(0, 63, (2, 8)).astype(np.int32),
        "uncond_ids": np.zeros((1, 8), np.int32),
        "uncond_t5_ids": np.zeros((1, 8), np.int32),
    }
    variables = cond.init(jax.random.PRNGKey(0), batch, rng=None)
    out = cond.apply(variables, batch, rng=None)
    assert out["crossattn"].shape == (2, 8, 32 + 48)

    # uncond pair: swapping to uncond ids changes the embedding
    c, uc = cond.get_unconditional_conditioning({"params": variables["params"]}, batch)
    assert c["crossattn"].shape == uc["crossattn"].shape
    assert not np.allclose(np.asarray(c["crossattn"]), np.asarray(uc["crossattn"]))

    # params import under the reference's dotted layout
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    keys = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("clip_encoder" in k for k in keys) and any("t5_encoder" in k for k in keys)
