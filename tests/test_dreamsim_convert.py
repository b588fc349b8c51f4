"""Golden parity for the DreamSim converters against the reference torch code
(modules/losses/dreamsim/utils.py:22-118): LoRA qkv merge math, full
state-dict merge with the double-PEFT prefix, and the CLIP key remap.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_loader import _load  # noqa: E402

from neurosis_tpu.losses.dreamsim_convert import (  # noqa: E402
    LORA_PREFIX,
    calculate_merged_weight,
    merge_dreamsim_lora,
    remap_clip,
)


@pytest.fixture(scope="module")
def ref_utils():
    """Load the reference dreamsim utils standalone (stub its model import)."""
    model_stub = types.ModuleType("neurosis.modules.losses.dreamsim.model")
    model_stub.DreamsimModel = object
    sys.modules["neurosis.modules.losses.dreamsim.model"] = model_stub
    pkg = types.ModuleType("neurosis.modules.losses.dreamsim")
    pkg.__path__ = [str(Path("/root/reference/src/neurosis/modules/losses/dreamsim"))]
    sys.modules.setdefault("neurosis.modules.losses.dreamsim", pkg)
    return _load("neurosis.modules.losses.dreamsim.utils", "modules/losses/dreamsim/utils.py")


def test_calculate_merged_weight_golden(ref_utils):
    rng = np.random.RandomState(0)
    dim, rank = 24, 4
    base = rng.randn(3 * dim, dim).astype(np.float32)
    # q and v adapted (2 groups), rank-4; PEFT saves lora_B as (out, rank, 1)
    lora_a = rng.randn(2 * rank, dim).astype(np.float32)
    lora_b = rng.randn(2 * dim, rank, 1).astype(np.float32)

    theirs = ref_utils.calculate_merged_weight(
        torch.from_numpy(lora_a.copy()),
        torch.from_numpy(lora_b.copy()),
        torch.from_numpy(base.copy()),
        0.5 / 16,
        [True, False, True],
    ).numpy()
    ours = calculate_merged_weight(lora_a, lora_b, base, 0.5 / 16, [True, False, True])
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_merge_dreamsim_lora_golden(ref_utils):
    """Full-state merge: same result as the reference's module-based merge."""
    rng = np.random.RandomState(1)
    dim, rank, layers = 16, 2, 2

    base_sd = {}
    for i in range(layers):
        base_sd[f"blocks.{i}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
        base_sd[f"blocks.{i}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)

    lora_sd = {}
    for i in range(layers):
        lora_sd[f"{LORA_PREFIX}blocks.{i}.attn.qkv.lora_A.weight"] = (
            rng.randn(2 * rank, dim).astype(np.float32)
        )
        lora_sd[f"{LORA_PREFIX}blocks.{i}.attn.qkv.lora_B.weight"] = (
            rng.randn(2 * dim, rank, 1).astype(np.float32)
        )

    ours = merge_dreamsim_lora(base_sd, lora_sd)

    # reference path needs an nn.Module; emulate with the same math per layer
    for i in range(layers):
        theirs = ref_utils.calculate_merged_weight(
            torch.from_numpy(lora_sd[f"{LORA_PREFIX}blocks.{i}.attn.qkv.lora_A.weight"]),
            torch.from_numpy(lora_sd[f"{LORA_PREFIX}blocks.{i}.attn.qkv.lora_B.weight"]),
            torch.from_numpy(base_sd[f"blocks.{i}.attn.qkv.weight"]),
            0.5 / 16,
            [True, False, True],
        ).numpy()
        np.testing.assert_allclose(ours[f"blocks.{i}.attn.qkv.weight"], theirs, atol=1e-6)
        # untouched weights pass through
        np.testing.assert_array_equal(
            ours[f"blocks.{i}.attn.proj.weight"], base_sd[f"blocks.{i}.attn.proj.weight"]
        )


def test_remap_clip_golden(ref_utils):
    rng = np.random.RandomState(2)
    sd = {
        "patch_embed.proj.weight": rng.randn(8, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(8).astype(np.float32),
        "pos_drop.weight": rng.randn(8).astype(np.float32),
        "pos_drop.bias": rng.randn(8).astype(np.float32),
        "head.weight": rng.randn(4, 8).astype(np.float32),
    }
    theirs = ref_utils.remap_clip({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, "clip_vitb32_single")
    ours = remap_clip(sd, "clip_vitb32_single")
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k].numpy(), atol=0)
    assert "extractor.norm_pre.weight" in ours
    assert "extractor.patch_embed.proj.bias" not in ours
    assert np.all(ours["extractor.head.bias"] == 0)

    # non-clip variants: passthrough + prefix only
    dino = remap_clip({"patch_embed.proj.bias": sd["patch_embed.proj.bias"]}, "dino_vitb16_single")
    assert "extractor.patch_embed.proj.bias" in dino


def test_convert_dreamsim_single_default_init(tmp_path):
    from neurosis_tpu.losses.dreamsim_convert import convert_dreamsim_single

    model, params = convert_dreamsim_single(tmp_path, "clip_vitb16")
    assert params is None
    assert model.pre_norm and model.act_layer == "quick_gelu" and model.layer_norm_eps == 1e-5
    with pytest.raises(NotImplementedError):
        convert_dreamsim_single(tmp_path, "nope_vit")
