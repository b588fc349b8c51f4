"""Golden forward parity for the DreamSim ViT ensemble vs the reference torch
implementation (modules/losses/dreamsim/{vit,model}.py), on shared synthetic
weights — upgrading the round-2 "converters golden" row to full golden
(VERDICT r2 next #4).

The reference modules load standalone via the package-stub technique from
test_dreamsim_convert (diffusers/torchvision shims; neither is installed)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from _reference_loader import _load  # noqa: E402


@pytest.fixture(scope="module")
def ref_dreamsim():
    """Load reference vit.py + model.py with diffusers/torchvision stubs.

    The stubs are removed at module teardown — leaking a fake `torchvision`
    into sys.modules breaks transformers imports in later test files."""
    from torch import nn

    stub_names = [
        "diffusers", "diffusers.configuration_utils", "diffusers.models",
        "diffusers.models.modeling_utils", "torchvision",
        "torchvision.transforms", "torchvision.transforms.v2",
        "neurosis.modules.losses.dreamsim",
        "neurosis.modules.losses.dreamsim.vit",
        "neurosis.modules.losses.dreamsim.model",
        "neurosis.modules.losses.dreamsim.common",
    ]
    saved = {n: sys.modules.get(n) for n in stub_names}

    # diffusers stubs (ConfigMixin/register_to_config/ModelMixin)
    cfg = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    cfg.ConfigMixin = ConfigMixin
    cfg.register_to_config = lambda fn: fn
    mdl = types.ModuleType("diffusers.models.modeling_utils")
    mdl.ModelMixin = nn.Module
    sys.modules.setdefault("diffusers", types.ModuleType("diffusers"))
    sys.modules["diffusers.configuration_utils"] = cfg
    sys.modules.setdefault("diffusers.models", types.ModuleType("diffusers.models"))
    sys.modules["diffusers.models.modeling_utils"] = mdl

    # torchvision.transforms.v2 stubs (Normalize exact, Resize unused: do_resize=False)
    class Normalize:
        def __init__(self, mean, std):
            self.m = torch.tensor(mean).view(1, 3, 1, 1)
            self.s = torch.tensor(std).view(1, 3, 1, 1)

        def __call__(self, x):
            return (x - self.m) / self.s

    class Resize:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class InterpolationMode:
        BICUBIC = "bicubic"

    v2 = types.ModuleType("torchvision.transforms.v2")
    v2.Normalize, v2.Resize, v2.InterpolationMode = Normalize, Resize, InterpolationMode
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.modules.setdefault("torchvision.transforms", types.ModuleType("torchvision.transforms"))
    sys.modules["torchvision.transforms.v2"] = v2

    pkg = types.ModuleType("neurosis.modules.losses.dreamsim")
    pkg.__path__ = [str(Path("/root/reference/src/neurosis/modules/losses/dreamsim"))]
    sys.modules["neurosis.modules.losses.dreamsim"] = pkg
    vit = _load("neurosis.modules.losses.dreamsim.vit", "modules/losses/dreamsim/vit.py")
    model = _load("neurosis.modules.losses.dreamsim.model", "modules/losses/dreamsim/model.py")
    yield vit, model
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


def _import_flax(template, torch_module, prefix=""):
    from neurosis_tpu.checkpoint import import_torch_params
    from neurosis_tpu.losses.dreamsim import split_vit_qkv

    sd = {prefix + k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    sd = split_vit_qkv(sd)
    params, missing, _unexpected = import_torch_params(template, sd)
    assert not missing, missing[:5]
    return params


@pytest.mark.parametrize(
    "pre_norm,act,num_classes,eps",
    [(False, "gelu", 0, 1e-6), (True, "quick_gelu", 8, 1e-5), (True, "gelu", 8, 1e-5)],
)
def test_vit_forward_parity(ref_dreamsim, pre_norm, act, num_classes, eps):
    """Tiny-dim VisionTransformer forward vs reference vit.py:202-357."""
    vit_mod, _ = ref_dreamsim
    from neurosis_tpu.losses.dreamsim import VisionTransformerB16

    torch.manual_seed(0)
    ref = vit_mod.vit_base_dreamsim(
        patch_size=8,
        layer_norm_eps=eps,
        num_classes=num_classes,
        act_layer=act,
        img_size=16,
        pre_norm=pre_norm,
    )
    # vit_base_dreamsim pins base dims; shrink for the test
    ref = vit_mod.VisionTransformer(
        img_size=16, patch_size=8, num_classes=num_classes, embed_dim=32, depth=2,
        num_heads=2, mlp_ratio=4, qkv_bias=True, pre_norm=pre_norm,
        norm_layer=lambda dim: torch.nn.LayerNorm(dim, eps=eps),
        act_layer=vit_mod.get_act_layer(act) if hasattr(vit_mod, "get_act_layer") else
        __import__("neurosis.modules.losses.dreamsim.common", fromlist=["get_act_layer"]).get_act_layer(act),
    ).eval()
    for p in ref.parameters():
        torch.nn.init.normal_(p, std=0.05)

    ours = VisionTransformerB16(
        image_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        num_classes=num_classes, pre_norm=pre_norm, act_layer=act, layer_norm_eps=eps,
    )
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    template = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(x), norm=pre_norm)
    )["params"]
    params = _import_flax(template, ref)

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)), norm=pre_norm).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x), norm=pre_norm))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dreamsim_single_distance_parity(ref_dreamsim):
    """End-to-end DreamsimModel distance (model.py:34-90: transforms →
    extractor → unit-norm − mean → 1 − cosine) on a full ViT-B tower."""
    _, model_mod = ref_dreamsim
    from neurosis_tpu.losses.dreamsim import DreamsimModel

    torch.manual_seed(1)
    ref = model_mod.DreamsimModel(image_size=64, pre_norm=False, act_layer="gelu").eval()
    for p in ref.parameters():
        torch.nn.init.normal_(p, std=0.02)

    ours = DreamsimModel(pre_norm=False, act_layer="gelu", do_resize=False)
    pair = np.random.RandomState(1).rand(2, 2, 64, 64, 3).astype(np.float32)
    template = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(pair)))["params"]
    params = _import_flax(template, ref)

    with torch.no_grad():
        want = ref(torch.from_numpy(pair.transpose(0, 1, 4, 2, 3))).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(pair)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_dreamsim_ensemble_distance_parity(ref_dreamsim):
    """DreamsimEnsemble (model.py:92-173): dino + clip(quick_gelu) + clip(gelu)
    towers, concat features, shared normalization, 1 − cosine."""
    _, model_mod = ref_dreamsim
    from neurosis_tpu.losses.dreamsim import DreamsimEnsemble

    torch.manual_seed(2)
    ref = model_mod.DreamsimEnsemble(image_size=64).eval()
    for p in ref.parameters():
        torch.nn.init.normal_(p, std=0.02)

    ours = DreamsimEnsemble(do_resize=False)
    pair = np.random.RandomState(2).rand(2, 1, 64, 64, 3).astype(np.float32)
    template = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(pair)))["params"]
    params = _import_flax(template, ref)

    with torch.no_grad():
        want = ref(torch.from_numpy(pair.transpose(0, 1, 4, 2, 3))).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(pair)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
