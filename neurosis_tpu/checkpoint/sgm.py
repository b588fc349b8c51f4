"""sgm/reference checkpoint import (parity: models/diffusion.py:127-144 init_from_ckpt).

Loads `.safetensors` / torch `.ckpt/.pt/.pth` state dicts in the reference key
layout and fills the engine's param trees:

  model.diffusion_model.*        → params['model']        (UNet)
  conditioner.embedders.N.*      → conditioner trees (CLIP towers match 1:1;
                                   open_clip fused qkv split automatically)
  first_stage_model.*            → frozen['first_stage']  (AutoencoderKL)

strict=False semantics: returns missing/unexpected instead of raising.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Any, Tuple

import numpy as np

from .torch_import import import_torch_params

logger = logging.getLogger(__name__)

CHECKPOINT_EXTNS = (".safetensors", ".ckpt", ".pt", ".pth")


def load_state_dict(path) -> dict:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _split_openclip(sd: dict) -> dict:
    from neurosis_tpu.models.text_encoder import split_openclip_qkv

    return split_openclip_qkv(sd)


# The reference stores the conditioner towers under a ModuleList —
# `conditioner.embedders.N.*` (embedding.py:88). Flax renames adopted
# sequence-field submodules to `embedders_N`, so translate the spelling at
# this boundary in both directions.
_EMB_REF = re.compile(r"^conditioner\.embedders\.(\d+)\.")
_EMB_OURS = re.compile(r"^conditioner\.embedders_(\d+)\.")


def _cond_keys_to_ours(sd: dict) -> dict:
    return {_EMB_REF.sub(r"conditioner.embedders_\1.", k): v for k, v in sd.items()}


def _cond_keys_to_ref(sd: dict) -> dict:
    return {_EMB_OURS.sub(r"conditioner.embedders.\1.", k): v for k, v in sd.items()}


def _ema_mangled_name(dotted: str) -> str:
    """LitEma buffer name: '.'-free param name under the `model_ema.` prefix
    (modules/ema.py:24-29 — `name.replace(".", "_")` over `self.model`'s
    named params, which carry the `diffusion_model.` prefix)."""
    return "model_ema." + dotted.replace(".", "_")


def export_ema_shadows(ema, decay: float = 0.9999) -> dict:
    """EMA shadow tree → reference `model_ema.*` mangled buffers.

    Only the UNet subtree is exported: the reference's LitEma wraps
    `self.model` alone (models/diffusion.py:96), so conditioner shadows have
    no reference key to land on. `decay`/`num_updates` buffers included."""
    from .torch_export import export_torch_state

    shadows = export_torch_state(ema.params["model"], prefix="diffusion_model.")
    sd = {_ema_mangled_name(k): v for k, v in shadows.items()}
    sd["model_ema.decay"] = np.asarray(decay, np.float32)
    sd["model_ema.num_updates"] = np.asarray(int(ema.num_updates), np.int32)
    return sd


def import_ema_shadows(ema, sd: dict) -> Tuple[Any, list, set]:
    """Fill an EmaState's UNet shadow subtree from `model_ema.*` buffers.

    Demangling '_' back to '.' is ambiguous (param names contain underscores),
    so instead we generate the expected mangled name for every shadow leaf we
    hold — exactly how LitEma itself resolves them via m_name2s_name — and
    look those up. Returns (new EmaState, missing_keys, consumed_sd_keys)."""
    import jax.numpy as jnp

    from neurosis_tpu.modules.ema import EmaState

    from .torch_export import export_torch_state
    from .torch_import import import_torch_params

    dotted = export_torch_state(ema.params["model"], prefix="diffusion_model.")
    synth = {}
    used = set()
    for name in dotted:
        mangled = _ema_mangled_name(name)
        if mangled in sd:
            synth[name] = sd[mangled]
            used.add(mangled)
    new_model, missing, _ = import_torch_params(ema.params["model"], synth, prefix="diffusion_model.")
    new_params = dict(ema.params)
    new_params["model"] = new_model
    n = sd.get("model_ema.num_updates")
    num_updates = jnp.asarray(int(np.asarray(n)), jnp.int32) if n is not None else ema.num_updates
    return EmaState(new_params, num_updates), missing, used


def load_sgm_checkpoint(engine, state, frozen: dict, path, with_report: bool = False):
    """Fill TrainState + frozen trees from a reference-layout checkpoint in
    ONE call — the init_from_ckpt equivalent (models/diffusion.py:127-144):
    `model.diffusion_model.*` → UNet, `conditioner.embedders.N.*` → both
    conditioner splits, `first_stage_model.*` → VAE, `model_ema.*` mangled
    buffers → EMA shadows. strict=False semantics: missing/unexpected are
    logged (and returned when `with_report`), never raised."""
    sd = _cond_keys_to_ours(_split_openclip(load_state_dict(path)))

    missing: list = []
    params = dict(state.params)
    new_model, m_unet, u_unet = import_torch_params(
        params["model"], sd, prefix="model.diffusion_model."
    )
    params["model"] = new_model
    missing += m_unet
    report = {"unet": (len(m_unet), len(u_unet))}
    unexpected = list(u_unet)

    # conditioner: trainable + frozen splits share the 'conditioner.' prefix —
    # a key is only unexpected if NEITHER split consumed it
    new_cond_t, m_t, u_t = import_torch_params(params["conditioner"], sd, prefix="conditioner.")
    params["conditioner"] = new_cond_t
    frozen = dict(frozen)
    new_cond_f, m_f, u_f = import_torch_params(frozen.get("conditioner", {}), sd, prefix="conditioner.")
    frozen["conditioner"] = new_cond_f
    u_cond = sorted(set(u_t) & set(u_f))
    missing += m_t + m_f
    unexpected += u_cond
    report["conditioner"] = (len(m_t) + len(m_f), len(u_cond))

    if "first_stage" in frozen:
        new_fs, m_fs, u_fs = import_torch_params(frozen["first_stage"], sd, prefix="first_stage_model.")
        frozen["first_stage"] = new_fs
        missing += m_fs
        unexpected += u_fs
        report["first_stage"] = (len(m_fs), len(u_fs))
    else:
        unexpected += [k for k in sd if k.startswith("first_stage_model.")]

    new_state = state._replace(params=params)
    ema_buffers = {"model_ema.decay", "model_ema.num_updates"}
    if getattr(state, "ema", None) is not None and any(k.startswith("model_ema.") for k in sd):
        new_ema, m_ema, used_ema = import_ema_shadows(state.ema, sd)
        new_state = new_state._replace(ema=new_ema)
        u_ema = [k for k in sd if k.startswith("model_ema.") and k not in used_ema | ema_buffers]
        missing += m_ema
        unexpected += u_ema
        report["model_ema"] = (len(m_ema), len(u_ema))
    else:
        unexpected += [k for k in sd if k.startswith("model_ema.") and k not in ema_buffers]

    known = ("model.diffusion_model.", "conditioner.", "first_stage_model.", "model_ema.")
    unexpected += [k for k in sd if not k.startswith(known)]

    for name, (n_missing, n_unexpected) in report.items():
        if n_missing or n_unexpected:
            logger.warning(
                f"checkpoint import: {name} missing {n_missing} / unexpected {n_unexpected} keys"
            )
        else:
            logger.info(f"checkpoint import: {name} fully loaded")
    if with_report:
        return new_state, frozen, {"missing": missing, "unexpected": unexpected, "per_component": report}
    return new_state, frozen


def export_sgm_checkpoint(engine, state, frozen: dict, path) -> None:
    """Write reference-layout safetensors from our trees (scripts/convert parity)."""
    from .torch_export import export_torch_state

    sd = {}
    sd.update(export_torch_state(state.params["model"], prefix="model.diffusion_model."))
    sd.update(export_torch_state(state.params.get("conditioner", {}), prefix="conditioner."))
    sd.update(export_torch_state(frozen.get("conditioner", {}), prefix="conditioner."))
    if "first_stage" in frozen:
        sd.update(export_torch_state(frozen["first_stage"], prefix="first_stage_model."))
    if getattr(state, "ema", None) is not None:
        sd.update(export_ema_shadows(state.ema, decay=getattr(engine, "ema_decay", 0.9999)))

    from safetensors.numpy import save_file

    save_file(_cond_keys_to_ref(sd), str(path))
