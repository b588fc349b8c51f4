"""Packaged assets: LPIPS lin-head weights + caption font ship in the wheel.

Parity: the reference packages identical files under src/neurosis/data
(files.py accessors, lpips/*.safetensors, fonts/NotoSansMono.ttf) so LPIPS
works offline with no runtime fetch.
"""


import numpy as np
import pytest


def test_asset_path_finds_packaged_files():
    from neurosis_tpu.assets import asset_path

    for sub, name in [
        ("lpips", "alex_lpips_v0.1.safetensors"),
        ("lpips", "vgg_lpips_v0.1.safetensors"),
        ("fonts", "NotoSansMono.ttf"),
    ]:
        p = asset_path(sub, name)
        assert p is not None and p.is_file(), f"missing packaged asset {sub}/{name}"
    assert asset_path("lpips", "nope.safetensors") is None


def test_find_lpips_weights_uses_packaged(monkeypatch):
    monkeypatch.delenv("NEUROSIS_DATA_DIR", raising=False)
    from neurosis_tpu.losses.lpips import find_lpips_weights

    p = find_lpips_weights("alex")
    assert p is not None and p.name == "alex_lpips_v0.1.safetensors"
    assert "assets" in str(p)

    from safetensors.numpy import load_file

    state = load_file(str(p))
    # LPIPS v0.1 alex lin heads: one 1x1 conv weight per pnet stage (5 stages)
    assert len(state) == 5
    for k, v in state.items():
        assert "lin" in k and "model.1.weight" in k, k
        assert v.ndim == 4 and v.shape[0] == 1 and v.shape[2:] == (1, 1)
        assert np.all(np.isfinite(v)) and float(np.abs(v).sum()) > 0


def test_default_font_is_packaged():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from neurosis_tpu.utils.image import _default_font

    font = _default_font(12)
    name = getattr(font, "getname", lambda: ("?",))()[0]
    assert "Noto Sans Mono" in name
