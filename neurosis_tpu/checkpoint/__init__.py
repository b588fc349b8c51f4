"""Checkpoint IO: torch/safetensors weight import-export + orbax sharded state."""

from .torch_import import flax_path_to_torch_key, import_torch_params, torch_key_to_flax_leaf

__all__ = ["flax_path_to_torch_key", "import_torch_params", "torch_key_to_flax_leaf"]
