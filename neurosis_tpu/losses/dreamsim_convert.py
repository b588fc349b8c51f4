"""DreamSim checkpoint converters — LoRA merge + CLIP key remap.

Parity target: modules/losses/dreamsim/utils.py:22-162. The published
DreamSim checkpoints are ViT bases plus qkv-only LoRA adapters saved by an
old PEFT; the reference merges them offline. Here the converters are pure
numpy state-dict transforms (no torch modules needed) feeding the Flax
DreamsimModel/DreamsimEnsemble via the usual torch→flax import.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

#: the cursed double-PEFT prefix on the shipped LoRA keys (utils.py:76)
LORA_PREFIX = "base_model.model.base_model.model.model."
#: DreamSim trains q and v only (utils.py:88-90)
QKV_SWITCHES = (True, False, True)
LORA_SCALE = 0.5 / 16


def calculate_merged_weight(
    lora_a: np.ndarray,
    lora_b: np.ndarray,
    base: np.ndarray,
    scale: float = LORA_SCALE,
    qkv_switches: Sequence[bool] = QKV_SWITCHES,
) -> np.ndarray:
    """Merge a grouped qkv LoRA delta into the fused base weight
    (utils.py:22-50): lora_b @ lora_a per active group, scattered into the
    q/k/v row blocks selected by qkv_switches."""
    n_switches = len(qkv_switches)
    n_groups = int(np.sum(qkv_switches))

    qkv_mask = np.asarray(qkv_switches, bool).reshape(n_switches, 1)
    qkv_mask = np.broadcast_to(qkv_mask, (n_switches, base.shape[0] // n_switches)).reshape(-1)

    lora_b = np.squeeze(np.asarray(lora_b))
    lora_a = np.asarray(lora_a)
    delta_w = np.zeros((lora_b.shape[0], base.shape[1]), base.dtype)

    grp_in = lora_a.shape[0] // n_groups
    grp_out = lora_b.shape[0] // n_groups
    for i in range(n_groups):
        delta_w[i * grp_out : (i + 1) * grp_out, :] = (
            lora_b[i * grp_out : (i + 1) * grp_out, :] @ lora_a[i * grp_in : (i + 1) * grp_in, :]
        )

    delta_full = np.zeros_like(base)
    delta_full[qkv_mask, :] = delta_w
    return (base + scale * delta_full).astype(base.dtype)


def merge_dreamsim_lora(base_state: dict, lora_state_or_path) -> dict:
    """Merge the LoRA adapters into every `attn.qkv.weight` of `base_state`
    (utils.py:53-96). Accepts a loaded state dict or a .safetensors/.pt path."""
    if isinstance(lora_state_or_path, (str, Path)):
        lora_sd = _load_state(Path(lora_state_or_path))
    else:
        lora_sd = dict(lora_state_or_path)

    group_weights = {
        k[len(LORA_PREFIX):]: np.asarray(v) for k, v in lora_sd.items() if k.startswith(LORA_PREFIX)
    }
    group_layers = {k.rsplit(".", 2)[0] for k in group_weights}

    out = dict(base_state)
    for key in [k for k in out if "attn.qkv.weight" in k]:
        param_name = key.rsplit(".", 1)[0]
        if param_name not in group_layers:
            logger.warning(f"QKV param '{param_name}' not found in lora weights")
            continue
        out[key] = calculate_merged_weight(
            group_weights[f"{param_name}.lora_A.weight"],
            group_weights[f"{param_name}.lora_B.weight"],
            np.asarray(out[key]),
        )
    return out


def remap_clip(state_dict: dict, variant: str) -> dict:
    """Original-DreamSim key remap (utils.py:99-118): drop the patch bias
    CLIP never had, pos_drop→norm_pre, synthesize a zero head bias; single
    variants gain the 'extractor.' prefix."""
    sd = dict(state_dict)
    if "clip" in variant:
        sd.pop("patch_embed.proj.bias", None)
        if "pos_drop.weight" in sd:
            sd["norm_pre.weight"] = sd.pop("pos_drop.weight")
            sd["norm_pre.bias"] = sd.pop("pos_drop.bias")
        if "head.weight" in sd and "head.bias" not in sd:
            sd["head.bias"] = np.zeros(np.asarray(sd["head.weight"]).shape[0], np.float32)
    if variant.endswith("single"):
        sd = {f"extractor.{k}": v for k, v in sd.items()}
    return sd


_VARIANTS = {
    # variant → (layer_norm_eps, pre_norm, act_layer)
    "open_clip_vitb16": (1e-5, True, "gelu"),
    "open_clip_vitb32": (1e-5, True, "gelu"),
    "clip_vitb16": (1e-5, True, "quick_gelu"),
    "clip_vitb32": (1e-5, True, "quick_gelu"),
    "dino_vitb16": (1e-6, False, "gelu"),
}


def convert_dreamsim_single(
    ckpt_path, variant: str, ensemble: bool = False, dtype=None
) -> Tuple["object", Optional[dict]]:
    """Build a DreamsimModel for `variant` and import its merged checkpoint
    (utils.py:120-162). Returns (module, flax_params | None)."""
    import jax
    import jax.numpy as jnp

    from neurosis_tpu.checkpoint import import_torch_params
    from neurosis_tpu.losses.dreamsim import DreamsimModel, split_vit_qkv

    if variant not in _VARIANTS:
        raise NotImplementedError(f"Unsupported model variant '{variant}'")
    eps, pre_norm, act = _VARIANTS[variant]
    model = DreamsimModel(pre_norm=pre_norm, act_layer=act, layer_norm_eps=eps, dtype=dtype)

    path = Path(ckpt_path)
    if path.exists() and path.is_dir():
        path = path / ("ensemble" if ensemble else variant) / f"{variant}_merged.safetensors"
    if not path.exists():
        logger.warning(f"no DreamSim checkpoint at {path}; returning default init")
        return model, None

    sd = _load_state(path)
    sd = remap_clip(sd, variant + "_single")
    sd = split_vit_qkv(sd)

    x = jnp.zeros((2, 1, 224, 224, 3), jnp.float32)
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))["params"]
    params, missing, unexpected = import_torch_params(template, sd)
    if missing:
        logger.warning(f"dreamsim import: missing {missing[:4]}...")
    return model, params


def _load_state(path: Path) -> dict:
    if path.suffix.lower() == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    return {k: v.numpy() for k, v in torch.load(str(path), map_location="cpu").items()}
