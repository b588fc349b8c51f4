"""Model summary table (parity: utils/summary/model.py:45-248 ModelSummary)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _human(n: float) -> str:
    for unit in ("", "K", "M", "B"):
        if abs(n) < 1000:
            return f"{n:.1f}{unit}" if unit else f"{int(n)}"
        n /= 1000
    return f"{n:.1f}T"


def summarize(params: Any, max_depth: int = 2) -> str:
    """Layer/param-count/size table over a flax param tree."""
    groups: dict[str, tuple[int, int]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = [str(getattr(p, "key", p)) for p in path]
        key = ".".join(parts[:max_depth])
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        size = n * np.dtype(leaf.dtype).itemsize if hasattr(leaf, "dtype") else 0
        cnt, sz = groups.get(key, (0, 0))
        groups[key] = (cnt + n, sz + size)

    name_w = max([len(k) for k in groups] + [6])
    lines = [f"{'module':<{name_w}} | {'params':>10} | {'size':>10}"]
    lines.append("-" * (name_w + 27))
    total_n = total_sz = 0
    for key in sorted(groups):
        n, sz = groups[key]
        total_n += n
        total_sz += sz
        lines.append(f"{key:<{name_w}} | {_human(n):>10} | {sz / 2**20:>8.1f}MB")
    lines.append("-" * (name_w + 27))
    lines.append(f"{'TOTAL':<{name_w}} | {_human(total_n):>10} | {total_sz / 2**20:>8.1f}MB")
    return "\n".join(lines)


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params) if hasattr(p, "shape"))
