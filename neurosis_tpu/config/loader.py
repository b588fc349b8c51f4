"""YAML config loading with ${...} interpolation + class_path instantiation.

Parity: the reference's jsonargparse/omegaconf stack (trainer/cli.py:131-149).
Implemented natively: pyyaml + a dotted-path `${a.b.c}` resolver (the subset
the reference configs actually use, e.g. `${data.init_args.image_key}`) and
env-var interpolation `${oc.env:NAME,default}`.
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping

import yaml

from .registry import resolve_class_path

_INTERP = re.compile(r"\$\{([^}]+)\}")


def load_config(path) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return resolve_interpolations(cfg)


def _lookup(root: Any, dotted: str) -> Any:
    cur = root
    for part in dotted.split("."):
        if isinstance(cur, Mapping):
            cur = cur[part]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(part)]
        else:
            raise KeyError(dotted)
    return cur


def resolve_interpolations(cfg: Any) -> Any:
    """Iteratively resolve ${dotted.path} and ${oc.env:VAR,default} strings."""

    def resolve_value(v: Any) -> Any:
        if not isinstance(v, str):
            return v
        m = _INTERP.fullmatch(v.strip())
        if m:  # whole-string interpolation preserves type
            return _resolve_expr(m.group(1), cfg)
        return _INTERP.sub(lambda mm: str(_resolve_expr(mm.group(1), cfg)), v)

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve_value(node)

    # two passes handle chained interpolations
    out = walk(cfg)
    return walk(out)


def _resolve_expr(expr: str, root: Any) -> Any:
    expr = expr.strip()
    if expr.startswith("oc.env:"):
        body = expr[len("oc.env:") :]
        name, _, default = body.partition(",")
        return os.environ.get(name.strip(), default.strip() or None)
    return _lookup(root, expr)


def instantiate(node: Any, **overrides) -> Any:
    """Recursively build the object graph from class_path/init_args nodes."""
    if isinstance(node, dict) and "class_path" in node:
        cls = resolve_class_path(node["class_path"])
        kwargs = {k: instantiate(v) for k, v in (node.get("init_args") or {}).items()}
        kwargs.update(node.get("dict_kwargs") or {})
        kwargs.update(overrides)
        kwargs = _adapt_kwargs(cls, kwargs)
        return cls(**kwargs)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def _adapt_kwargs(cls, kwargs: dict) -> dict:
    """Drop torch-only args our components don't take (device/verbose/etc.)."""
    import dataclasses as dc
    import inspect

    try:
        if dc.is_dataclass(cls):
            fields = {f.name for f in dc.fields(cls)}
        else:
            sig = inspect.signature(cls)
            if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
                return kwargs
            fields = set(sig.parameters)
    except (ValueError, TypeError):
        return kwargs
    dropped = {k for k in kwargs if k not in fields}
    for k in dropped:
        kwargs.pop(k)
    return kwargs
