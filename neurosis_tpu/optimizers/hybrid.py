"""Hybrid optimizer — different optimizers per param subtree.

Parity target: optimizers/hybrid.py:9-197 (HybridOptimizer merges multiple
torch optimizers so Lightning sees one). The optax-native equivalent is
`optax.multi_transform` with a label tree; this wrapper builds it from
{label: optimizer} + a predicate on param paths.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import optax


def hybrid_optimizer(
    optimizers: Mapping[str, optax.GradientTransformation],
    label_fn: Callable[[tuple, Any], str],
) -> optax.GradientTransformation:
    """One transformation dispatching per-leaf by `label_fn(path, leaf)`."""

    def make_labels(params):
        flat = jax.tree_util.tree_flatten_with_path(params)
        labels = [label_fn(tuple(str(getattr(p, "key", p)) for p in path), leaf) for path, leaf in flat[0]]
        bad = set(labels) - set(optimizers)
        if bad:
            raise ValueError(f"label_fn produced unknown labels {bad}")
        return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), labels)

    return optax.multi_transform(dict(optimizers), make_labels)
