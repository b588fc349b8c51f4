"""Load individual reference source files for golden-value parity tests.

Loads single modules from /root/reference/src (read-only) via importlib WITHOUT
importing the `neurosis` package (whose __init__ pulls heavy deps). Modules with
intra-package imports get lightweight stubs. Used only in tests, never at runtime.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF_SRC = Path("/root/reference/src/neurosis")


def _load(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(name, REF_SRC / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_math():
    """Returns (preconditioning, weighting, discretization, sigma_generators) reference modules."""
    import torch

    # stub neurosis.utils.append_zero / append_dims for discretization+loss imports
    utils_stub = types.ModuleType("neurosis.utils")
    utils_stub.append_zero = lambda x: torch.cat([x, x.new_zeros([1])])

    def append_dims(x, target_dims):
        return x[(...,) + (None,) * (target_dims - x.ndim)]

    utils_stub.append_dims = append_dims
    pkg_stub = types.ModuleType("neurosis")
    pkg_stub.__path__ = [str(REF_SRC)]
    sys.modules.setdefault("neurosis", pkg_stub)
    sys.modules["neurosis.utils"] = utils_stub

    precond = _load("ref_precond", "modules/diffusion/denoiser_preconditioning.py")
    weighting = _load("ref_weighting", "modules/diffusion/denoiser_weighting.py")

    # discretization imports `from .util import make_beta_schedule` via relative path
    # `from neurosis...` — it does `from neurosis.utils import append_zero` and
    # `from .util import make_beta_schedule`; load util first under the right name.
    util = _load("neurosis.modules.diffusion.util", "modules/diffusion/util.py")
    mods_pkg = types.ModuleType("neurosis.modules")
    mods_pkg.__path__ = [str(REF_SRC / "modules")]
    sys.modules.setdefault("neurosis.modules", mods_pkg)
    diff_pkg = types.ModuleType("neurosis.modules.diffusion")
    diff_pkg.__path__ = [str(REF_SRC / "modules/diffusion")]
    diff_pkg.util = util
    sys.modules.setdefault("neurosis.modules.diffusion", diff_pkg)
    discret = _load("neurosis.modules.diffusion.discretization", "modules/diffusion/discretization.py")

    sys.modules["neurosis.modules.diffusion.discretization"] = discret
    sigma_gen = _load(
        "neurosis.modules.diffusion.sampling.sigma_generators",
        "modules/diffusion/sampling/sigma_generators.py",
    )
    return precond, weighting, discret, sigma_gen


def load_reference_unet():
    """Load the reference UNetModel (modules/diffusion/openaimodel.py) standalone."""
    import torch

    pkg_stub = sys.modules.get("neurosis") or types.ModuleType("neurosis")
    pkg_stub.__path__ = [str(REF_SRC)]
    sys.modules.setdefault("neurosis", pkg_stub)
    if "neurosis.modules" not in sys.modules:
        mods_pkg = types.ModuleType("neurosis.modules")
        mods_pkg.__path__ = [str(REF_SRC / "modules")]
        sys.modules["neurosis.modules"] = mods_pkg
    if "neurosis.modules.diffusion" not in sys.modules:
        diff_pkg = types.ModuleType("neurosis.modules.diffusion")
        diff_pkg.__path__ = [str(REF_SRC / "modules/diffusion")]
        sys.modules["neurosis.modules.diffusion"] = diff_pkg
    if "neurosis.modules.diffusion.util" not in sys.modules:
        _load("neurosis.modules.diffusion.util", "modules/diffusion/util.py")
    if "neurosis.modules.attention" not in sys.modules:
        _load("neurosis.modules.attention", "modules/attention.py")
    om = _load("neurosis.modules.diffusion.openaimodel", "modules/diffusion/openaimodel.py")
    return om


def load_reference_vae():
    """Load the reference VAE Encoder/Decoder (modules/diffusion/model.py) standalone."""
    load_reference_unet()  # sets up package stubs + attention
    if "neurosis.modules.layers" not in sys.modules:
        _load("neurosis.modules.layers", "modules/layers.py")
    if "neurosis.modules.distributions" not in sys.modules:
        _load("neurosis.modules.distributions", "modules/distributions.py")
    if "neurosis.modules.regularizers" not in sys.modules:
        _load("neurosis.modules.regularizers", "modules/regularizers.py")
    return _load("neurosis.modules.diffusion.model", "modules/diffusion/model.py")
