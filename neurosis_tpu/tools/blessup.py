"""VAE brightness/contrast "blessing" (parity: utils/blessup/bless.py:14-200).

Scales/offsets the decoder's conv_out (or encoder conv_in) weights in an
LDM-format VAE checkpoint:

  python -m neurosis_tpu.tools.blessup model.safetensors out.safetensors \
      --contrast 1.05 --brightness 0.02 [--encoder]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

ADJUST_KEYS = {
    "decoder": {"contrast": "decoder.conv_out.weight", "brightness": "decoder.conv_out.bias"},
    "encoder": {"contrast": "encoder.conv_in.weight", "brightness": "encoder.conv_in.bias"},
}


def bless(state: dict, contrast: float = 1.0, brightness: float = 0.0,
          contrast_op: str = "mul", brightness_op: str = "add", target: str = "decoder") -> dict:
    keys = ADJUST_KEYS[target]
    out = dict(state)
    ops = {"mul": np.multiply, "add": np.add}
    for prefix_key, key in (("contrast", keys["contrast"]), ("brightness", keys["brightness"])):
        if key not in out:
            # tolerate first_stage_model.-prefixed ckpts
            key = f"first_stage_model.{key}"
            if key not in out:
                continue
        value = contrast if prefix_key == "contrast" else brightness
        op = ops[contrast_op if prefix_key == "contrast" else brightness_op]
        out[key] = op(np.asarray(out[key]), value)
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_path", type=Path)
    parser.add_argument("output_path", type=Path)
    parser.add_argument("--contrast", type=float, default=1.0)
    parser.add_argument("--brightness", type=float, default=0.0)
    parser.add_argument("--contrast-op", choices=["mul", "add"], default="mul")
    parser.add_argument("--brightness-op", choices=["mul", "add"], default="add")
    parser.add_argument("--encoder", action="store_true", help="adjust encoder conv_in instead")
    args = parser.parse_args(argv)

    from neurosis_tpu.checkpoint.sgm import load_state_dict

    state = load_state_dict(args.model_path)
    state = bless(
        state,
        contrast=args.contrast,
        brightness=args.brightness,
        contrast_op=args.contrast_op,
        brightness_op=args.brightness_op,
        target="encoder" if args.encoder else "decoder",
    )
    from safetensors.numpy import save_file

    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.asarray(v) for k, v in state.items()}, str(args.output_path))
    print(f"blessed → {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
