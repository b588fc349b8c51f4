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


def load_sgm_checkpoint(engine, state, frozen: dict, path) -> Tuple[Any, dict]:
    """Fill TrainState + frozen trees from a reference-layout checkpoint."""
    sd = _split_openclip(load_state_dict(path))

    report = {}
    params = dict(state.params)
    new_model, missing, unexpected = import_torch_params(
        params["model"], sd, prefix="model.diffusion_model."
    )
    params["model"] = new_model
    report["unet"] = (len(missing), 0)

    # conditioner: trainable + frozen splits share the 'conditioner.' prefix
    new_cond_t, m_t, _ = import_torch_params(params["conditioner"], sd, prefix="conditioner.")
    params["conditioner"] = new_cond_t
    frozen = dict(frozen)
    new_cond_f, m_f, _ = import_torch_params(frozen.get("conditioner", {}), sd, prefix="conditioner.")
    frozen["conditioner"] = new_cond_f
    report["conditioner"] = (len(m_t) + len(m_f), 0)

    if "first_stage" in frozen:
        new_fs, m_fs, _ = import_torch_params(frozen["first_stage"], sd, prefix="first_stage_model.")
        frozen["first_stage"] = new_fs
        report["first_stage"] = (len(m_fs), 0)

    for name, (n_missing, _) in report.items():
        if n_missing:
            logger.warning(f"checkpoint import: {name} missing {n_missing} keys")
        else:
            logger.info(f"checkpoint import: {name} fully loaded")
    return state._replace(params=params), frozen


def export_sgm_checkpoint(engine, state, frozen: dict, path) -> None:
    """Write reference-layout safetensors from our trees (scripts/convert parity)."""
    from .torch_export import export_torch_state

    sd = {}
    sd.update(export_torch_state(state.params["model"], prefix="model.diffusion_model."))
    sd.update(export_torch_state(state.params.get("conditioner", {}), prefix="conditioner."))
    sd.update(export_torch_state(frozen.get("conditioner", {}), prefix="conditioner."))
    if "first_stage" in frozen:
        sd.update(export_torch_state(frozen["first_stage"], prefix="first_stage_model."))

    from safetensors.numpy import save_file

    save_file(sd, str(path))
