"""Ring attention over a mesh axis (context/sequence parallelism, SURVEY.md §5.7).

The reference has no sequence parallelism; this is the TPU-native scaling axis
for long spatial sequences (1024px+ → 16k tokens): q/k/v shard along the
sequence over a 'context' mesh axis; each device computes blockwise attention
against its local kv shard, kv shards rotate around the ring with
`jax.lax.ppermute` (ICI neighbor exchange), and per-shard partial results merge
with online-softmax statistics. Differentiable end-to-end: the inner kernel is
the Pallas flash forward (stats exposed) or a jnp fallback, the merges are jnp.

Use under `shard_map` with q/k/v sharded as P(None, None, 'context', None).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp



def _attention_with_stats(q: jax.Array, k: jax.Array, v: jax.Array):
    """softmax attention returning (out, row_max m, row_sum l) for merging."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1)  # (b,h,s)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)  # (b,h,s)
    o = jnp.einsum("bhst,bhtd->bhsd", p.astype(q.dtype), v)  # UNNORMALIZED
    return o, m, l


def _merge(o1, m1, l1, o2, m2, l2):
    """Combine two unnormalized blockwise attention results."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    o = o1 * a1[..., None].astype(o1.dtype) + o2 * a2[..., None].astype(o2.dtype)
    l = l1 * a1 + l2 * a2
    return o, m, l


def ring_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "context",
    inner: Optional[Callable] = None,
) -> jax.Array:
    """Non-causal ring attention for [B, H, S_local, D] shards inside shard_map.

    Each of the `n` ring steps attends the local q against one kv shard, then
    rotates kv to the next neighbor. Output is the exact softmax over the FULL
    sequence, sharded back along S.
    """
    inner = inner or _attention_with_stats
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    o, m, l = inner(q, k, v)

    def body(i, carry):
        o, m, l, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o2, m2, l2 = inner(q, k, v)
        o, m, l = _merge(o, m, l, o2, m2, l2)
        return (o, m, l, k, v)

    o, m, l, _, _ = jax.lax.fori_loop(0, n - 1, body, (o, m, l, k, v))
    return o / l[..., None].astype(o.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis_name: str = "context",
) -> jax.Array:
    """Convenience wrapper: shard_map ring attention over `mesh[axis_name]`
    for full [B, H, S, D] arrays (S divisible by the axis size)."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    try:  # jax >= 0.8: jax.shard_map (check_vma replaced check_rep)
        fn = jax.shard_map(
            partial(ring_self_attention, axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm

        fn = _sm(
            partial(ring_self_attention, axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_rep=False,
        )
    return fn(q, k, v)
