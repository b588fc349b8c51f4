"""Scaled dot-product attention dispatch.

The reference picks between torch SDPA / xformers CUDA kernels at module-build
time (modules/attention.py:421-425, 187-258). Here the equivalent choice is:

  - TPU: a Pallas flash-attention kernel (ops/flash_attention.py) for long
    sequences, XLA fused attention otherwise;
  - CPU (tests): plain jnp reference path — XLA fuses it adequately.

All paths are numerically the standard softmax(q·kᵀ/√d)·v — the backend is a
performance choice only, so tests run the jnp path and TPU runs Pallas.

Layout: [B, H, S, D] (batch, heads, seq, head_dim) like torch SDPA.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

# Sequence-length threshold above which the Pallas kernel wins over XLA's
# unfused path (short cross-attn sequences (77 tokens) don't benefit).
_PALLAS_MIN_SEQ = 512


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference attention; softmax statistics in fp32 for bf16 stability."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhst,bhtd->bhsd", weights, v)
    # named so the "names" remat policy saves the attention output (the
    # Pallas path names its own residuals inside the custom_vjp fwd)
    return jax.ad_checkpoint.checkpoint_name(out, "attn_out")


def _ambient_physical_mesh():
    """The mesh installed by `with Mesh(...):` (the Trainer's style). The
    supported accessor for that legacy context is thread_resources — read via
    the internal module to avoid the public alias's deprecation warning."""
    try:
        from jax._src.mesh import thread_resources

        mesh = thread_resources.env.physical_mesh
        return None if mesh.empty else mesh
    except Exception:  # pragma: no cover - jax internals moved
        return None


def _use_pallas() -> bool:
    if os.environ.get("NEUROSIS_DISABLE_PALLAS", "").lower() in ("1", "true"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_dmajor_path(q_seq: int) -> bool:
    """True when the folded D-major projection path should feed the Pallas
    kernel directly (modules/attention.py): TPU + flash-eligible q length +
    not disabled via NEUROSIS_FOLD_QKV=0."""
    if os.environ.get("NEUROSIS_FOLD_QKV", "").lower() in ("0", "false"):
        return False
    return _use_pallas() and q_seq >= _PALLAS_MIN_SEQ


@functools.partial(jax.named_call, name="sdpa_dmajor")
def dot_product_attention_dmajor(qt: jax.Array, kt: jax.Array, vt: jax.Array) -> jax.Array:
    """Attention over D-major [B, H, D, S] tensors, D-major output.

    Pallas zero-transpose entry on TPU; the jnp fallback transposes in/out
    (CPU tests — numerics identical, layout is a perf concern only)."""
    if _use_pallas():
        from .flash_attention import flash_attention_dmajor

        try:
            return flash_attention_dmajor(qt, kt, vt)
        except Exception:  # pragma: no cover - kernel unsupported shape fallback
            pass
    o = _xla_attention(qt.swapaxes(2, 3), kt.swapaxes(2, 3), vt.swapaxes(2, 3))
    return o.swapaxes(2, 3)


@functools.partial(jax.named_call, name="sdpa")
def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    context_axis: Optional[str] = None,
) -> jax.Array:
    """softmax(q kᵀ / sqrt(d)) v over [B, H, S, D] tensors.

    context_axis: when set, self-attention runs as ring attention over that
    mesh axis — sequence parallelism over ICI. Works both inside an enclosing
    shard_map (the axis is already manual) and under plain jit with an ambient
    mesh (`with mesh:` / `jax.set_mesh`): the dispatch then opens its own
    shard_map, sharding S along the axis and the batch along the remaining
    mesh axes. Sequences not divisible by the axis size fall back to
    replicated attention (correctness over parallelism).
    """
    if context_axis is not None:
        from .ring_attention import ring_self_attention

        out = None
        am = jax.sharding.get_abstract_mesh()
        if context_axis in getattr(am, "manual_axes", ()):
            # enclosing shard_map already owns the axis
            out = ring_self_attention(q, k, v, axis_name=context_axis)
        else:
            mesh = am if not am.empty else _ambient_physical_mesh()
            if mesh is not None and context_axis in mesh.axis_names:
                n_ctx = mesh.shape[context_axis]
                if q.shape[2] % n_ctx == 0 and n_ctx > 1:
                    from jax.sharding import PartitionSpec as P

                    # batch rides every other mesh axis that divides it
                    keep, prod = [], 1
                    for a in mesh.axis_names:
                        sz = mesh.shape[a]
                        if a != context_axis and sz > 1 and q.shape[0] % (prod * sz) == 0:
                            keep.append(a)
                            prod *= sz
                    spec = P(tuple(keep) or None, None, context_axis, None)
                    out = jax.shard_map(
                        functools.partial(ring_self_attention, axis_name=context_axis),
                        mesh=mesh,
                        in_specs=(spec, spec, spec),
                        out_specs=spec,
                        check_vma=False,
                    )(q, k, v)
        if out is not None:
            # named so the "names"/"dots_names" remat policies save the ring
            # output instead of re-running the cross-chip permute loop in bwd
            return jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        # no usable context axis (absent from the mesh, or S not divisible):
        # fall through to single-program attention on the full sequence
    if _use_pallas() and mask is None and q.shape[-2] >= _PALLAS_MIN_SEQ:
        from .flash_attention import flash_attention

        try:
            return flash_attention(q, k, v)
        except Exception:  # pragma: no cover - kernel unsupported shape fallback
            pass
    return _xla_attention(q, k, v, mask)
