"""Config system: YAML + class_path DI against a component registry."""

from .loader import instantiate, load_config, resolve_interpolations
from .registry import REGISTRY, register, resolve_class_path

__all__ = [
    "instantiate",
    "load_config",
    "resolve_interpolations",
    "REGISTRY",
    "register",
    "resolve_class_path",
]
