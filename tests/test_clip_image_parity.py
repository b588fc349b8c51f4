"""Golden parity: FrozenOpenCLIPImageEmbedder vs a torch replica of the
reference path (models/text_encoder/clip.py:390-540).

The torch side reproduces the reference exactly:
  - preprocess: kornia.geometry.resize(x,(224,224),'bicubic',
    align_corners=True, antialias) == F.interpolate(...) (kornia delegates),
    then [-1,1]→[0,1]→CLIP mean/std;
  - open_clip VisualTransformer (conv1 patchify, cls+pos, ln_pre, pre-LN
    blocks with fused-qkv MHA, ln_post on the pooled token, @proj).
Weights are shared via the fused-qkv split + torch→flax import, so outputs
must match numerically. Also covers the bicubic resize op itself against
torch.nn.functional.interpolate across modes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from neurosis_tpu.checkpoint import import_torch_params  # noqa: E402
from neurosis_tpu.models.text_encoder import split_openclip_qkv  # noqa: E402
from neurosis_tpu.models.text_encoder.clip_image import (  # noqa: E402
    CLIP_MEAN,
    CLIP_STD,
    FrozenOpenCLIPImageEmbedder,
)
from neurosis_tpu.ops.resize import bicubic_resize  # noqa: E402


@pytest.mark.parametrize(
    "shape,out,ac,aa",
    [
        ((256, 256), (224, 224), True, True),  # the reference CLIP-image path
        ((320, 200), (224, 224), True, True),
        ((64, 64), (224, 224), True, True),  # upscale with antialias flag
        ((256, 256), (224, 224), True, False),
        ((300, 300), (150, 100), False, True),
        ((224, 224), (448, 448), False, False),
    ],
)
def test_bicubic_resize_matches_torch(shape, out, ac, aa):
    rng = np.random.RandomState(0)
    x = rng.rand(2, *shape, 3).astype(np.float32) * 2 - 1
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), out, mode="bicubic", align_corners=ac, antialias=aa
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    ours = np.asarray(bicubic_resize(x, out, align_corners=ac, antialias=aa))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def _torch_visual(width, layers, heads, patch, image_size, output_dim):
    """open_clip VisualTransformer replica (no attn_pool): ln_post on the
    pooled cls token only, tokens returned raw (transformer.py semantics)."""

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.ModuleDict(
                dict(c_fc=nn.Linear(width, width * 4), c_proj=nn.Linear(width * 4, width))
            )

        def forward(self, x):
            y = self.ln_1(x)
            y = self.attn(y, y, y, need_weights=False)[0]
            x = x + y
            y = self.ln_2(x)
            return x + self.mlp["c_proj"](F.gelu(self.mlp["c_fc"](y)))

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            n = (image_size // patch) ** 2
            self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = nn.Parameter(torch.randn(n + 1, width) * 0.02)
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = nn.ModuleDict(
                dict(resblocks=nn.ModuleList([Block() for _ in range(layers)]))
            )
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(torch.randn(width, output_dim) * 0.02)

        def forward(self, x):
            b = x.shape[0]
            x = self.conv1(x)  # (b, width, g, g)
            x = x.reshape(b, x.shape[1], -1).permute(0, 2, 1)  # (b, n, width)
            cls = self.class_embedding[None, None].expand(b, 1, -1)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x)
            x = x.permute(1, 0, 2)
            for blk in self.transformer["resblocks"]:
                x = blk(x)
            x = x.permute(1, 0, 2)
            pooled, tokens = x[:, 0], x[:, 1:]
            pooled = self.ln_post(pooled) @ self.proj
            return pooled, tokens

    return Visual()


def test_clip_image_embedder_golden():
    torch.manual_seed(0)
    width, layers, heads, patch, img, out_dim = 64, 2, 4, 16, 224, 48
    visual = _torch_visual(width, layers, heads, patch, img, out_dim).eval()

    rng = np.random.RandomState(1)
    # non-square, non-224 input: exercises the kornia-equivalent resize
    image = (rng.rand(2, 256, 192, 3).astype(np.float32) * 2) - 1

    # torch reference forward (preprocess == reference preprocess())
    xt = torch.from_numpy(image).permute(0, 3, 1, 2)
    xt = F.interpolate(xt, (img, img), mode="bicubic", align_corners=True, antialias=True)
    xt = (xt + 1.0) / 2.0
    xt = (xt - torch.tensor(CLIP_MEAN)[None, :, None, None]) / torch.tensor(CLIP_STD)[None, :, None, None]
    with torch.no_grad():
        pooled_t, tokens_t = visual(xt)

    emb = FrozenOpenCLIPImageEmbedder(
        image_size=img, patch_size=patch, width=width, layers=layers, heads=heads,
        output_dim=out_dim, output_tokens=True,
    )
    tmpl = jax.eval_shape(lambda: emb.init(jax.random.PRNGKey(0), jnp.asarray(image)))
    sd = split_openclip_qkv({f"model.visual.{k}": v.numpy() for k, v in visual.state_dict().items()})
    params, missing, unexpected = import_torch_params(tmpl["params"], sd)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    pooled, tokens = jax.jit(emb.apply)({"params": params}, jnp.asarray(image))
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(tokens), tokens_t.numpy(), atol=2e-4, rtol=1e-3)
