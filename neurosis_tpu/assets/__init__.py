"""Packaged binary assets (weights/fonts shipped inside the wheel).

Parity: the reference packages the same assets under `neurosis/data`
(src/neurosis/data/files.py accessors; lpips/*.safetensors are the LPIPS v0.1
linear-head weights, fonts/NotoSansMono.ttf is the caption-grid font). These
are redistributable binary data, not code:

  - lpips/{alex,vgg}_lpips_v0.1.safetensors — LPIPS v0.1 lin-head weights
    (richzhang/PerceptualSimilarity, BSD-2-Clause).
  - fonts/NotoSansMono.ttf — Noto Sans Mono (SIL Open Font License 1.1).

Lookup precedence for weights elsewhere in the package: explicit path >
NEUROSIS_DATA_DIR > this package > HF cache.
"""

from __future__ import annotations

from importlib import resources
from pathlib import Path
from typing import Optional


def asset_path(subdir: str, name: str) -> Optional[Path]:
    """Return a filesystem path to a packaged asset, or None if absent.

    Uses importlib.resources so it works from an installed wheel as well as a
    source checkout (assets are real files in both; zipped wheels are not
    supported by this project's build config).
    """
    try:
        root = resources.files(__package__)
    except (ModuleNotFoundError, TypeError):  # pragma: no cover
        return None
    candidate = root.joinpath(subdir).joinpath(name)
    try:
        if candidate.is_file():
            return Path(str(candidate))
    except OSError:  # pragma: no cover
        return None
    return None
