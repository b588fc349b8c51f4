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