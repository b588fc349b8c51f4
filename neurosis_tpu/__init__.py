"""neurosis_tpu — a TPU-native (JAX/XLA/Pallas/pjit) latent-diffusion training framework.

From-scratch rebuild of the capabilities of ``neggles/neurosis`` (PyTorch Lightning
SD/SDXL + VAE trainer) with an idiomatic JAX architecture:

- pure-functional train steps under ``jit``/``shard_map`` over a device mesh,
- Flax neural modules (UNet, VAE, CLIP/OpenCLIP text towers),
- Pallas flash-attention kernels on the hot path,
- explicit PRNG threading instead of global RNG state,
- the same YAML ``class_path``/``init_args`` config surface, resolved against a
  registry of these components.

Reference parity citations use ``file:line`` into the reference tree (see SURVEY.md).
"""

import logging
import os

__version__ = "0.1.0"

NEUROSIS_DEBUG = os.environ.get("NEUROSIS_DEBUG", "").lower() in ("1", "true", "yes")


def is_debug() -> bool:
    """Debug-mode flag (reference: src/neurosis/__init__.py:28-40, NEUROSIS_DEBUG env)."""
    return NEUROSIS_DEBUG


def get_dir() -> str:
    """Resolve the data/cache dir (reference: src/neurosis/__init__.py:50-60)."""
    d = os.environ.get("NEUROSIS_DIR", os.path.join(os.path.expanduser("~"), ".cache", "neurosis_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


logging.getLogger(__name__).addHandler(logging.NullHandler())
