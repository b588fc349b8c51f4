"""Golden parity for text towers.

- CLIPTextTower vs transformers.CLIPTextModel (tiny random config, no download)
- OpenCLIPTextTower vs a torch pre-LN resblock walk built on nn.MultiheadAttention
  exactly as open_clip's TextTransformer does (fused in_proj → split_openclip_qkv).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.checkpoint import import_torch_params  # noqa: E402
from neurosis_tpu.models.text_encoder import (  # noqa: E402
    CLIPTextTower,
    OpenCLIPTextTower,
    split_openclip_qkv,
)


def test_clip_text_tower_parity():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    # eos_token_id=2 selects HF's legacy argmax(ids) pooling — the path the
    # real openai/clip-vit-large-patch14 config uses (and what we implement).
    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    ref = CLIPTextModel(cfg)
    ref.eval()

    ids = np.array([[49, 3, 7, 99, 0, 0], [49, 5, 99, 0, 0, 0]], dtype=np.int32)
    # HF eos pooling: for this config eos_token_id=2 path may differ; the
    # reference relies on argmax(ids) (EOS=highest id). Make 99 the highest.
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True)

    tower = CLIPTextTower(vocab_size=100, width=32, layers=3, heads=4, max_positions=16)
    tmpl = jax.eval_shape(lambda: tower.init(jax.random.PRNGKey(0), jnp.asarray(ids)))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, missing, unexpected = import_torch_params(tmpl["params"], sd)
    # HF stores position_ids buffers in some versions; tolerate those only
    unexpected = [k for k in unexpected if "position_ids" not in k and "embeddings.position_ids" not in k]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    got = jax.jit(tower.apply)({"params": params}, jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    for i in (0, 2, 3):
        np.testing.assert_allclose(
            np.asarray(got["hidden_states"][i]), out.hidden_states[i].numpy(), atol=2e-5, rtol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def _torch_openclip_text(width, layers, heads, vocab, ctx):
    """Minimal torch replica of open_clip's text tower (pre-LN, fused-qkv MHA)."""
    import torch
    from torch import nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.ModuleDict(
                dict(c_fc=nn.Linear(width, width * 4), c_proj=nn.Linear(width * 4, width))
            )

        def forward(self, x, attn_mask):
            y = self.ln_1(x)
            y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
            x = x + y
            y = self.ln_2(x)
            y = self.mlp["c_proj"](torch.nn.functional.gelu(self.mlp["c_fc"](y)))
            return x + y

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(vocab, width)
            self.positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
            self.transformer = nn.ModuleDict(
                dict(resblocks=nn.ModuleList([Block() for _ in range(layers)]))
            )
            self.ln_final = nn.LayerNorm(width)
            self.text_projection = nn.Parameter(torch.randn(width, width) * 0.01)
            mask = torch.full((ctx, ctx), float("-inf"))
            mask.triu_(1)
            self.attn_mask = mask

        def forward(self, ids):
            x = self.token_embedding(ids) + self.positional_embedding[: ids.shape[1]]
            x = x.permute(1, 0, 2)
            penultimate = None
            for i, r in enumerate(self.transformer["resblocks"]):
                if i == len(self.transformer["resblocks"]) - 1:
                    penultimate = x.permute(1, 0, 2)
                x = r(x, self.attn_mask[: x.shape[0], : x.shape[0]])
            last = x.permute(1, 0, 2)
            last_ln = self.ln_final(last)
            pooled = last_ln[torch.arange(ids.shape[0]), ids.argmax(dim=-1)] @ self.text_projection
            return penultimate, last, last_ln, pooled

    return Tower()


def test_openclip_text_tower_parity():
    import torch

    torch.manual_seed(0)
    ref = _torch_openclip_text(width=32, layers=3, heads=4, vocab=100, ctx=16)
    ref.eval()

    ids = np.array([[49, 3, 7, 99, 0, 0], [49, 5, 99, 0, 0, 0]], dtype=np.int32)
    with torch.no_grad():
        pen_t, last_t, last_ln_t, pooled_t = ref(torch.from_numpy(ids.astype(np.int64)))

    tower = OpenCLIPTextTower(vocab_size=100, width=32, layers=3, heads=4, max_positions=16)
    tmpl = jax.eval_shape(lambda: tower.init(jax.random.PRNGKey(0), jnp.asarray(ids)))
    sd = split_openclip_qkv({k: v.numpy() for k, v in ref.state_dict().items()})
    params, missing, unexpected = import_torch_params(tmpl["params"], sd)
    unexpected = [k for k in unexpected if k != "attn_mask"]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    got = jax.jit(tower.apply)({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got["penultimate"]), pen_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["last"]), last_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["pooled"]), pooled_t.numpy(), atol=2e-5, rtol=1e-4)
