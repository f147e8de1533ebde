"""LSE-merge algebra — the composition primitive for blockwise attention.

Two partial attentions over *disjoint* KV sets, each returning (out, lse),
combine exactly:

    lse   = logaddexp(lse1, lse2)
    out   = exp(lse1 - lse) * out1 + exp(lse2 - lse) * out2

This is the quantity the reference exposes as ``softmax_lse_ptr``
(flash_attn.h:16) and is what makes flash-decode split-KV, ring attention,
and multi-host long-context decode composable.  Fully-masked partials carry
lse = -inf and weight 0 — merging with them is the identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def lse_merge(outs, lses, axis: int = 0):
    """Merge partial attention results stacked along ``axis``.

    Args:
      outs: [..., S, ..., D]-shaped stack of partial outputs, split axis at
        ``axis``; any float dtype (accumulated in fp32).
      lses: matching stack of LSE values, shape = outs.shape minus the
        trailing head_dim axis.

    Returns (out, lse) with the stack axis reduced.
    """
    outs = jnp.asarray(outs)
    lses = jnp.asarray(lses)
    out_dtype = outs.dtype
    outs = outs.astype(jnp.float32)
    lses = lses.astype(jnp.float32)

    lse = jax.scipy.special.logsumexp(lses, axis=axis)
    # Weight for fully-masked partials (lse_i = -inf) must be exactly 0;
    # where even the merged lse is -inf, output is defined as 0.
    safe_lse = jnp.where(jnp.isfinite(lse), lse, 0.0)
    w = jnp.exp(lses - jnp.expand_dims(safe_lse, axis))
    w = jnp.where(jnp.isfinite(lses), w, 0.0)
    out = jnp.sum(outs * w[..., None], axis=axis)
    return out.astype(out_dtype), lse


def lse_merge2(out1, lse1, out2, lse2):
    """Pairwise merge — the form used inside ring-attention steps.

    out*: [..., D]; lse*: out.shape[:-1]. Returns (out, lse) in fp32.
    """
    out1 = out1.astype(jnp.float32)
    out2 = out2.astype(jnp.float32)
    lse1 = lse1.astype(jnp.float32)
    lse2 = lse2.astype(jnp.float32)
    m = jnp.maximum(lse1, lse2)
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    e1 = jnp.where(jnp.isfinite(lse1), jnp.exp(lse1 - safe_m), 0.0)
    e2 = jnp.where(jnp.isfinite(lse2), jnp.exp(lse2 - safe_m), 0.0)
    s = e1 + e2
    lse = jnp.where(s > 0.0, safe_m + jnp.log(jnp.maximum(s, 1e-37)), NEG_INF)
    denom = jnp.maximum(s, 1e-37)
    out = (out1 * e1[..., None] + out2 * e2[..., None]) / denom[..., None]
    return out, lse
