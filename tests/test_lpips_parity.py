"""Golden LPIPS parity vs the reference implementation with the REAL shipped
lin-head weights (/root/reference/src/neurosis/data/lpips/*.safetensors).

torchvision is not installed here, so the test provides a minimal stub with the
exact torchvision AlexNet/VGG16 `features` layouts (the only parts LPIPS uses)
and a `create_feature_extractor` that returns the tapped relu outputs. The
reference perceptual.py (modules/losses/perceptual.py:64-186) then runs
UNMODIFIED: real lin weights + random-but-shared trunk weights, compared
against the Flax LPIPS layer for layer.
"""

import sys
import types
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF_LPIPS_DIR = Path("/root/reference/src/neurosis/data/lpips")

pytestmark = pytest.mark.skipif(
    not REF_LPIPS_DIR.exists(), reason="reference LPIPS weights not on disk"
)


# ---------------------------------------------------------------------------
# torchvision stub: exact AlexNet/VGG16 `features` Sequential layouts
# ---------------------------------------------------------------------------


def _alexnet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=False), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(inplace=False), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(inplace=False),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(inplace=False),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(inplace=False), tnn.MaxPool2d(3, 2),
    )


def _vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, 1, 1), tnn.ReLU(inplace=False)]
            in_ch = v
    return tnn.Sequential(*layers)


class _Extractor(tnn.Module):
    """create_feature_extractor stand-in: run `features`, collect taps."""

    def __init__(self, features: tnn.Sequential, taps: dict):
        super().__init__()
        self.features = features
        self.taps = {int(k.split(".")[1]): v for k, v in taps.items()}

    def forward(self, x):
        out = {}
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.taps:
                out[self.taps[i]] = x
        return out


@pytest.fixture()
def ref_perceptual_mod():
    """Install torchvision + neurosis.data stubs, load the reference
    extractors/perceptual modules, and REMOVE the stubs afterwards so they
    don't shadow real imports (transformers probes torchvision) for the rest
    of the pytest process."""
    added = {}

    def _put(name, mod):
        added[name] = sys.modules.get(name)
        sys.modules[name] = mod

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    fx_mod = types.ModuleType("torchvision.models.feature_extraction")

    class _Model(tnn.Module):
        def __init__(self, features):
            super().__init__()
            self.features = features

    class _W:  # weights enum stand-in; never downloaded
        DEFAULT = None

    tvm.AlexNet_Weights = _W
    tvm.VGG16_Weights = _W
    tvm.alexnet = lambda weights=None: _Model(_alexnet_features())
    tvm.vgg16 = lambda weights=None: _Model(_vgg16_features())
    fx_mod.create_feature_extractor = lambda model, features: _Extractor(model.features, features)
    tvm.feature_extraction = fx_mod
    tv.models = tvm
    _put("torchvision", tv)
    _put("torchvision.models", tvm)
    _put("torchvision.models.feature_extraction", fx_mod)

    # neurosis.data.lpips_checkpoint → the real shipped safetensors
    @contextmanager
    def lpips_checkpoint(name: str):
        from safetensors.torch import load_file

        yield load_file(str(REF_LPIPS_DIR / f"{name}_lpips_v0.1.safetensors"))

    data_stub = types.ModuleType("neurosis.data")
    data_stub.lpips_checkpoint = lpips_checkpoint
    if "neurosis" not in sys.modules:
        _put("neurosis", types.ModuleType("neurosis"))
    _put("neurosis.data", data_stub)

    from _reference_loader import _load

    losses_pkg = types.ModuleType("neurosis.modules.losses")
    if "neurosis.modules" not in sys.modules:
        _put("neurosis.modules", types.ModuleType("neurosis.modules"))
    _put("neurosis.modules.losses", losses_pkg)
    _load("neurosis.modules.losses.extractors", "modules/losses/extractors.py")
    mod = _load("neurosis.modules.losses.perceptual", "modules/losses/perceptual.py")
    try:
        yield mod
    finally:
        for name, prev in added.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev


@pytest.mark.parametrize("pnet_type", ["alex", "vgg"])
def test_lpips_golden_with_shipped_lin_weights(pnet_type, ref_perceptual_mod):
    ref_perceptual = ref_perceptual_mod

    torch.manual_seed(0)
    ref = ref_perceptual.LPIPS(pnet_type=pnet_type, pretrained=True, verbose=False).eval()

    # state dict: random trunk + REAL lin heads (loaded by _load_pretrained)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # sanity: the shipped lin weights actually landed (non-default values)
    from safetensors.numpy import load_file

    shipped = load_file(str(REF_LPIPS_DIR / f"{pnet_type}_lpips_v0.1.safetensors"))
    np.testing.assert_array_equal(sd["lins.relu1.model.1.weight"], shipped["lin0.model.1.weight"])

    from neurosis_tpu.losses.lpips import LPIPS, load_lpips_params

    model = LPIPS(pnet_type=pnet_type)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    template = model.init(jax.random.PRNGKey(0), x, y)["params"]

    trunk = {k[len("pnet."):]: v for k, v in sd.items() if k.startswith("pnet.")}
    params = load_lpips_params(
        template,
        pnet_type=pnet_type,
        trunk_state=trunk,
        lin_path=REF_LPIPS_DIR / f"{pnet_type}_lpips_v0.1.safetensors",
    )

    ours = np.asarray(model.apply({"params": params}, x, y)).reshape(-1)

    with torch.no_grad():
        theirs = (
            ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(y).permute(0, 3, 1, 2))
            .numpy()
            .reshape(-1)
        )

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-6)
