"""Shape-stacked optimizer wrapper: batch per-leaf updates with vmap.

TPU-first optimization with no reference analog (torch optimizers run
foreach-fused CUDA kernels; XLA instead emits one kernel chain PER PARAMETER
LEAF). On the SDXL UNet the optimizer's ~7, 000 tiny scalar-output reductions
(RMS/clipping/factored stats, ~2-40 us each) cost ~126 ms of a 474 ms train
step — pure kernel-launch overhead, not bandwidth.

`stacked(inner)` groups parameter leaves by (shape, grad dtype, param dtype),
stacks each group along a new leading axis, and runs `jax.vmap(inner.update)`
once per group: ~700 leaves collapse into ~30 batched updates, so every
reduction runs over [N, ...] at full VPU occupancy.

Semantics are exactly per-leaf `inner` (vmap slices see the original shapes,
so factored-dim selection, parameter-scale, schedules etc. are unchanged);
verified bit-comparable in tests/test_stacked_optimizer.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class StackedState(NamedTuple):
    inner_states: tuple  # one vmapped inner state per shape group


def _group_indices(params_leaves, grads_leaves):
    """Deterministic grouping: leaf indices bucketed by (shape, dtypes)."""
    groups: dict[Any, list[int]] = {}
    for i, (p, g) in enumerate(zip(params_leaves, grads_leaves)):
        key = (tuple(p.shape), jnp.dtype(p.dtype).name, jnp.dtype(g.dtype).name)
        groups.setdefault(key, []).append(i)
    # sort for a stable order independent of dict insertion details
    return [groups[k] for k in sorted(groups.keys(), key=repr)]


def stacked(
    inner: optax.GradientTransformation,
    max_stack_elems: int = 1 << 20,
) -> optax.GradientTransformation:
    """Wrap `inner` so same-shaped SMALL leaves update as one vmapped batch.

    Leaves larger than `max_stack_elems` stay on the plain per-leaf path: their
    reductions are bandwidth-bound (launch overhead is a small fraction) and
    stacking them would materialize multi-GB transient param/grad copies —
    measured OOM on a 16G v5e at SDXL scale when everything was stacked. The
    default 1M-element cutoff stacks ~59% of the SDXL UNet's 1680 leaves for
    ~190MB of transient copies.
    """

    def _stackable(idx, leaves):
        return len(idx) > 1 and leaves[idx[0]].size <= max_stack_elems

    def init_fn(params):
        leaves, _ = jax.tree_util.tree_flatten(params)
        idx_groups = _group_indices(leaves, leaves)
        states = []
        for idx in idx_groups:
            if _stackable(idx, leaves):
                states.append(jax.vmap(inner.init)(jnp.stack([leaves[i] for i in idx])))
            else:
                states.append(tuple(inner.init(leaves[i]) for i in idx))
        return StackedState(inner_states=tuple(states))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("stacked() requires params (inner transforms may need them)")
        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        p_leaves = treedef.flatten_up_to(params)
        idx_groups = _group_indices(p_leaves, g_leaves)
        if len(idx_groups) != len(state.inner_states):
            raise ValueError(
                f"stacked(): {len(idx_groups)} shape groups at update time vs "
                f"{len(state.inner_states)} at init — param tree changed"
            )

        out_leaves: list = [None] * len(g_leaves)
        new_states = []
        for idx, s in zip(idx_groups, state.inner_states):
            if _stackable(idx, p_leaves):
                g_stack = jnp.stack([g_leaves[i] for i in idx])
                p_stack = jnp.stack([p_leaves[i] for i in idx])
                u_stack, s_new = jax.vmap(inner.update)(g_stack, s, p_stack)
                new_states.append(s_new)
                for j, i in enumerate(idx):
                    out_leaves[i] = u_stack[j]
            else:
                s_list = []
                for s_i, i in zip(s, idx):
                    u_i, s_i2 = inner.update(g_leaves[i], s_i, p_leaves[i])
                    out_leaves[i] = u_i
                    s_list.append(s_i2)
                new_states.append(tuple(s_list))
        return treedef.unflatten(out_leaves), StackedState(inner_states=tuple(new_states))

    return optax.GradientTransformation(init_fn, update_fn)


def stacked_global_norm(tree) -> jax.Array:
    """optax.global_norm with one reduction kernel per shape group instead of
    one per leaf (~700 -> ~30 kernels on the SDXL UNet grad tree)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    groups = _group_indices(leaves, leaves)
    total = jnp.zeros((), jnp.float32)
    for idx in groups:
        stack = jnp.stack([leaves[i] for i in idx]).astype(jnp.float32)
        total = total + jnp.sum(stack * stack)
    return jnp.sqrt(total)
