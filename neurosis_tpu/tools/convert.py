"""Checkpoint conversion tools (parity: scripts/convert/*).

  - export: our orbax/param trees → sgm-layout safetensors
    (sdxl-neurosis2sgm.py direction)
  - sd15-ldm2neurosis key remap: `cond_stage_model.` → `conditioner.embedders.0.`
    (sd15-ldm2neurosis.py:21-30)
  - vae extraction: pull `first_stage_model.*` into a bare VAE file
    (vae-neurosis2ldm.py direction)
  - patch-te: swap text-encoder weights between checkpoints (sdxl-patch-te.py)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

SD15_LDM_REMAP = {
    "cond_stage_model.": "conditioner.embedders.0.",
}


def remap_sd15_ldm(state: dict) -> dict:
    out = {}
    for k, v in state.items():
        for old, new in SD15_LDM_REMAP.items():
            if k.startswith(old):
                k = new + k[len(old) :]
                break
        out[k] = v
    return out


def extract_vae(state: dict, prefix: str = "first_stage_model.") -> dict:
    return {k[len(prefix) :]: v for k, v in state.items() if k.startswith(prefix)}


def patch_te(base: dict, donor: dict, prefixes=("conditioner.embedders.",)) -> dict:
    out = dict(base)
    n = 0
    for k, v in donor.items():
        if any(k.startswith(p) for p in prefixes) and k in out:
            out[k] = v
            n += 1
    print(f"patched {n} text-encoder tensors")
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("sd15-ldm2neurosis")
    p.add_argument("input", type=Path)
    p.add_argument("output", type=Path)

    p = sub.add_parser("extract-vae")
    p.add_argument("input", type=Path)
    p.add_argument("output", type=Path)

    p = sub.add_parser("patch-te")
    p.add_argument("base", type=Path)
    p.add_argument("donor", type=Path)
    p.add_argument("output", type=Path)

    args = parser.parse_args(argv)

    from safetensors.numpy import save_file

    from neurosis_tpu.checkpoint.sgm import load_state_dict

    if args.cmd == "sd15-ldm2neurosis":
        out = remap_sd15_ldm(load_state_dict(args.input))
    elif args.cmd == "extract-vae":
        out = extract_vae(load_state_dict(args.input))
    elif args.cmd == "patch-te":
        out = patch_te(load_state_dict(args.base), load_state_dict(args.donor))
    else:  # pragma: no cover
        return 1

    args.output.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in out.items()}, str(args.output))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
