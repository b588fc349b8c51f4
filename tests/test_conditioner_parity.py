"""Golden parity: GeneralConditioner dim-routing/concat vs the reference
(modules/encoders/embedding.py:59-149) using Identity embedders on both sides
so the routing decisions (2D→vector, 3D→crossattn; cat dims) are the whole
behavior under test, plus force_zero_embeddings."""

import pathlib as _pl

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _load_ref_conditioner():
    import sys
    import types

    import torch

    sys.path.insert(0, "tests")
    from _reference_loader import _load

    if "neurosis.utils" not in sys.modules or not hasattr(
        sys.modules.get("neurosis.utils", None), "np_text_decode"
    ):
        u = sys.modules.get("neurosis.utils") or types.ModuleType("neurosis.utils")

        def np_text_decode(text, aslist=False):
            if not isinstance(text, list):
                text = [text]
            text = [x.decode("utf-8") if isinstance(x, (np.bytes_, bytes)) else x for x in text]
            return text if (aslist or len(text) > 1) else text[0]

        u.np_text_decode = np_text_decode
        u.count_params = lambda m, verbose=False: sum(p.numel() for p in m.parameters())
        u.append_dims = lambda x, n: x[(...,) + (None,) * (n - x.ndim)]
        u.append_zero = lambda x: torch.cat([x, x.new_zeros([1])])
        sys.modules["neurosis.utils"] = u
    emb = _load("ref_conditioner_embedding", "modules/encoders/embedding.py")
    return emb


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "tokens_a": rng.randn(2, 7, 16).astype(np.float32),  # 3D → crossattn
        "vec_b": rng.randn(2, 8).astype(np.float32),  # 2D → vector
        "tokens_c": rng.randn(2, 7, 24).astype(np.float32),  # 3D → crossattn (cat dim 2)
        "vec_d": rng.randn(2, 12).astype(np.float32),  # 2D → vector (cat dim 1)
    }


def test_routing_and_concat_parity():
    import torch

    emb_mod = _load_ref_conditioner()

    class RefIdentity(emb_mod.AbstractEmbModel):
        def forward(self, x):
            return torch.as_tensor(x)

    keys = ["tokens_a", "vec_b", "tokens_c", "vec_d"]
    ref = emb_mod.GeneralConditioner([RefIdentity(input_key=k) for k in keys])
    batch = _batch()
    with torch.no_grad():
        ref_out = ref({k: torch.from_numpy(v) for k, v in batch.items()})

    from neurosis_tpu.modules.encoders import GeneralConditioner, IdentityEncoder, with_embedder_names

    ours = GeneralConditioner(
        embedders=with_embedder_names([IdentityEncoder(input_key=k) for k in keys])
    )
    params = ours.init(jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}, rng=None)
    out = ours.apply(params, {k: jnp.asarray(v) for k, v in batch.items()}, rng=None)

    assert set(out) >= {"crossattn", "vector"}
    np.testing.assert_allclose(
        np.asarray(out["crossattn"]), ref_out["crossattn"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out["vector"]), ref_out["vector"].numpy(), rtol=1e-6)
    # shapes prove the cat dims: crossattn (2,7,16+24), vector (2,8+12)
    assert out["crossattn"].shape == (2, 7, 40)
    assert out["vector"].shape == (2, 20)


def test_force_zero_embeddings_parity():
    import torch

    emb_mod = _load_ref_conditioner()

    class RefIdentity(emb_mod.AbstractEmbModel):
        def forward(self, x):
            return torch.as_tensor(x)

    keys = ["tokens_a", "vec_b"]
    ref = emb_mod.GeneralConditioner([RefIdentity(input_key=k) for k in keys])
    batch = _batch(1)
    with torch.no_grad():
        ref_out = ref(
            {k: torch.from_numpy(v) for k, v in batch.items()},
            force_zero_embeddings=["tokens_a"],
        )
    assert float(ref_out["crossattn"].abs().max()) == 0.0
    assert float(ref_out["vector"].abs().max()) > 0.0

    from neurosis_tpu.modules.encoders import GeneralConditioner, IdentityEncoder, with_embedder_names

    ours = GeneralConditioner(
        embedders=with_embedder_names([IdentityEncoder(input_key=k) for k in keys])
    )
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = ours.init(jax.random.PRNGKey(0), jb, rng=None)
    out = ours.apply(params, jb, rng=None, force_zero_embeddings=["tokens_a"])
    assert float(jnp.abs(out["crossattn"]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(out["vector"]), ref_out["vector"].numpy(), rtol=1e-6)
