"""Transformer blocks for the diffusion UNet (Flax/NHWC, Pallas-backed attention).

Behavioral parity targets (reference, formulas/ordering only):
  - GEGLU / FeedForward: modules/attention.py:50-74
  - CrossAttention (SDPA semantics): modules/attention.py:187-258
  - BasicTransformerBlock: modules/attention.py:421-511
  - SpatialTransformer: modules/attention.py:567-667

TPU-first design: the backend zoo (softmax / xformers / torch-sdp) collapses to
one `ops.dot_product_attention` dispatch (Pallas flash kernel on TPU, XLA
elsewhere); tokens stay [B, S, C] with a single NHWC reshape at the
SpatialTransformer boundary.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from neurosis_tpu.ops.attention import dot_product_attention

from .layers import Conv2d, Dense, GroupNorm32

Dtype = jnp.dtype

# Save the folded-path projection kernels (reshaped weights) as named remat
# residuals: the in-situ profile attributes ~6 ms/step to 1280x1280
# weight-layout copies re-materialized under remat (60 tx blocks x 4
# projections). Costs ~0.8 GB HBM at SDXL b2. Step-level bench decides.
_SAVE_PROJ_WT = os.environ.get("NEUROSIS_SAVE_PROJ_WT", "0") == "1"


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        # torch F.gelu default is exact (erf) — jax default is tanh-approx
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="net.0")(x)
        else:
            x = Dense(inner, dtype=self.dtype, name="net.0")(x)
            x = nn.gelu(x, approximate=False)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return Dense(self.dim_out or self.dim, dtype=self.dtype, name="net.2")(x)


class CrossAttention(nn.Module):
    """Self/cross attention; context=None ⇒ self-attention."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    context_axis: Optional[str] = None  # ring-attention mesh axis (self-attn only)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        to_q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = Dense(self.query_dim, dtype=self.dtype, name="to_out.0")

        axis = self.context_axis if context is None else None
        from neurosis_tpu.ops.attention import use_dmajor_path

        if axis is None and use_dmajor_path(x.shape[1]):
            out = self._folded(x, ctx, to_q, to_k, to_v, to_out)
        else:
            q = to_q(x)
            k = to_k(ctx)
            v = to_v(ctx)

            b, s, _ = q.shape
            t = k.shape[1]
            q = q.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            k = k.reshape(b, t, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            v = v.reshape(b, t, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            # ring attention only for self-attention (q/kv share the sharded seq)
            out = dot_product_attention(q, k, v, context_axis=axis)
            # the backends name their outputs/residuals ("attn_out"/"attn_lse",
            # see ops/attention.py + ops/flash_attention.py) so the "names"
            # remat policy can skip re-running the attention kernel in bwd
            out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
            out = to_out(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out

    def _folded(self, x, ctx, to_q, to_k, to_v, to_out):
        """Zero-transpose projection path (+3.4% on the block, exact same
        math — tools/transpose_fold_bench.py): q/k/v projections emit the
        flash kernel's native D-major (B,H,D,S) layout directly via einsum
        output permutation, and the out-projection consumes it.

        The Dense submodules are invoked once on a dummy token so their
        params exist under the UNCHANGED tree paths (to_q/Dense_0/kernel…);
        XLA dead-code-eliminates the dummy matmuls. The einsums then read
        the kernels directly."""
        from neurosis_tpu.ops.attention import dot_product_attention_dmajor

        b, s, c = x.shape
        c_ctx = ctx.shape[-1]
        heads, dim = self.heads, self.dim_head
        for mod, tokens in ((to_q, x), (to_k, ctx), (to_v, ctx), (to_out, x)):
            _ = mod(jnp.zeros((1, 1, tokens.shape[-1] if mod is not to_out else heads * dim), tokens.dtype))
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        def kernel_of(mod):
            w = mod.variables["params"]["Dense_0"]["kernel"].astype(dt)
            if _SAVE_PROJ_WT:
                w = jax.ad_checkpoint.checkpoint_name(w, "proj_wt")
            return w

        xq = x.astype(dt)
        xc = ctx.astype(dt)
        qt = jnp.einsum("bsc,chd->bhds", xq, kernel_of(to_q).reshape(c, heads, dim))
        kt = jnp.einsum("bsc,chd->bhds", xc, kernel_of(to_k).reshape(c_ctx, heads, dim))
        vt = jnp.einsum("bsc,chd->bhds", xc, kernel_of(to_v).reshape(c_ctx, heads, dim))
        ot = dot_product_attention_dmajor(qt, kt, vt)
        wo = kernel_of(to_out).reshape(heads, dim, self.query_dim)
        out = jnp.einsum("bhds,hdc->bsc", ot, wo)
        bias = to_out.variables["params"]["Dense_0"].get("bias")
        if bias is not None:
            out = out + bias.astype(dt)
        return out


class BasicTransformerBlock(nn.Module):
    """norm→attn1(self)→res, norm→attn2(cross)→res, norm→ff→res."""

    dim: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    context_dim: Optional[int] = None
    gated_ff: bool = True
    disable_self_attn: bool = False
    context_axis: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn1_ctx_dim = self.context_dim if self.disable_self_attn else None
        h = _layer_norm(x, self.dtype, name="norm1", parent=self)
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=attn1_ctx_dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            context_axis=self.context_axis,
            dtype=self.dtype,
            name="attn1",
        )(h, context=context if self.disable_self_attn else None, deterministic=deterministic)

        h = _layer_norm(x, self.dtype, name="norm2", parent=self)
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attn2",
        )(h, context=context, deterministic=deterministic)

        h = _layer_norm(x, self.dtype, name="norm3", parent=self)
        x = x + FeedForward(
            self.dim, glu=self.gated_ff, dropout=self.dropout, dtype=self.dtype, name="ff"
        )(h, deterministic=deterministic)
        return x


def _layer_norm(x: jax.Array, dtype, name: str, parent: nn.Module) -> jax.Array:
    """fp32 LayerNorm (torch LN runs in fp32 under AMP).

    Called from inside the parent's compact ``__call__`` so the submodule is
    registered on the caller; ``parent`` documents that contract.
    """
    orig = x.dtype
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
    return ln(x.astype(jnp.float32)).astype(orig)


class SpatialTransformer(nn.Module):
    """NHWC image ↔ token transformer (modules/attention.py:567-667).

    use_linear=True (SDXL) projects after the reshape with a Dense; otherwise a
    1x1 conv before it. Residual add at the end; proj_out zero-initialised.
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    use_linear: bool = False
    use_checkpoint: bool = True
    # jax.checkpoint policy per transformer block:
    #   full     — recompute everything in bwd (min memory, ~11% extra FLOPs)
    #   dots     — save dot outputs with no batch dims (≈full here: every
    #              transformer matmul has a batch dim)
    #   dots_all — save ALL matmul outputs, recompute elementwise only
    #   names    — save the attention outputs + flash lse (checkpoint_name),
    #              skip re-running the attention kernel in bwd
    #   dots_names — dots_all ∪ names (recompute elementwise only)
    #   none     — no remat (max memory)
    remat_policy: str = "full"
    context_axis: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.in_channels
        inner = self.n_heads * self.d_head
        x_in = x

        x = GroupNorm32(32, epsilon=1e-6, name="norm")(x)
        if not self.use_linear:
            x = Conv2d(inner, 1, padding=0, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, x.shape[-1])
        if self.use_linear:
            x = Dense(inner, dtype=self.dtype, name="proj_in")(x)

        block_cls = BasicTransformerBlock
        if self.use_checkpoint and self.remat_policy != "none":
            import jax.ad_checkpoint as adc

            policy = None  # "full": recompute everything
            saved_names = ("attn_out", "attn_lse") + (("proj_wt",) if _SAVE_PROJ_WT else ())
            names_policy = adc.checkpoint_policies.save_only_these_names(*saved_names)
            if self.remat_policy == "dots":
                policy = adc.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif self.remat_policy == "dots_all":
                policy = adc.checkpoint_policies.dots_saveable
            elif self.remat_policy == "names":
                policy = names_policy
            elif self.remat_policy == "dots_names":
                # save every matmul output AND the attention residuals: the
                # bwd remat recomputes only elementwise ops (norms/gelu)
                policy = adc.checkpoint_policies.save_from_both_policies(
                    adc.checkpoint_policies.dots_saveable, names_policy
                )
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=(2,), policy=policy)
        for d in range(self.depth):
            x = block_cls(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                context_axis=self.context_axis,
                dtype=self.dtype,
                name=f"transformer_blocks.{d}",
            )(x, context, deterministic)

        if self.use_linear:
            x = Dense(self.in_channels, dtype=self.dtype, zero_init=True, name="proj_out")(x)
        x = x.reshape(b, h, w, x.shape[-1])
        if not self.use_linear:
            x = Conv2d(self.in_channels, 1, padding=0, dtype=self.dtype, zero_init=True, name="proj_out")(x)
        return x + x_in
