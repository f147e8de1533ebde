"""Pure-jnp oracle attention — the test bed for every Pallas kernel.

Implements the full semantic surface of the reference C ABI
(``flash_attn.h:10-134``) as straight-line jnp in fp32:

- dense BSHD layouts (flash_attn.h:10-12) and MQA/GQA head broadcast
  (num_heads vs num_heads_k, flash_attn.h:22-23),
- causal masking (flash_attn.h:29, bottom-right aligned per FA2 convention)
  and arbitrary additive masks (attn_mask/mask_dims, flash_attn.h:35-36),
- segment-ids (the TPU-native form of varlen cu_seqlens, flash_attn.h:41-42),
- reproducible dropout on the probability matrix (p_dropout + seed/offset,
  flash_attn.h:26,33-34),
- LSE residual output in ``b x h x seqlen_q`` layout (flash_attn.h:16,74),
- optional materialised probability matrix (return_softmax, flash_attn.h:30).

Everything is fp32 internally regardless of input dtype; the Pallas kernels
are required to match this oracle to dtype-scaled tolerances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _broadcast_kv_heads(k: jax.Array, num_heads: int) -> jax.Array:
    """GQA/MQA: repeat KV heads across query-head groups (flash_attn.h:22-23)."""
    num_heads_k = k.shape[2]
    if num_heads_k == num_heads:
        return k
    if num_heads % num_heads_k != 0:
        raise ValueError(
            f"num_heads ({num_heads}) must be a multiple of num_heads_k ({num_heads_k})"
        )
    return jnp.repeat(k, num_heads // num_heads_k, axis=2)


def attention_bias(
    *,
    seqlen_q: int,
    seqlen_k: int,
    causal: bool = False,
    mask: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    window: tuple[int, int] | None = None,
    dtype=jnp.float32,
) -> jax.Array | None:
    """Combine all masking mechanisms into one additive bias of shape
    broadcastable to [B, H, Sq, Sk]; None means no masking at all."""
    bias = None

    def add(b):
        nonlocal bias
        bias = b if bias is None else bias + b

    if causal or window is not None:
        qi = jnp.arange(seqlen_q)[:, None]
        kj = jnp.arange(seqlen_k)[None, :]
        # Bottom-right alignment: q row i may see k cols j <= i + (Sk - Sq).
        shift = seqlen_k - seqlen_q
        allowed = jnp.ones((seqlen_q, seqlen_k), dtype=bool)
        if causal:
            allowed &= kj <= qi + shift
        if window is not None:
            left, right = window
            if left >= 0:
                allowed &= kj >= qi + shift - left
            if right >= 0:
                allowed &= kj <= qi + shift + right
        add(jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None, :, :])

    if q_segment_ids is not None:
        if kv_segment_ids is None:
            raise ValueError("q_segment_ids given without kv_segment_ids")
        same = q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        add(jnp.where(same, 0.0, NEG_INF).astype(dtype))

    if mask is not None:
        add(mask.astype(dtype))

    return bias


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    mask: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    window: tuple[int, int] | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    logit_softcap: float | None = None,
    alibi_slopes=None,
    return_lse: bool = False,
    return_softmax: bool = False,
):
    """Naive softmax-GEMM-GEMM attention oracle.

    Args:
      q: [B, Sq, H, D]; k, v: [B, Sk, Hk, D] with H % Hk == 0 (GQA broadcast).
      causal: bottom-right-aligned causal mask (flash_attn.h:29).
      mask: additive bias broadcastable to [B, H, Sq, Sk] (flash_attn.h:35-36).
      q_segment_ids / kv_segment_ids: [B, Sq] / [B, Sk] int32; attention only
        within equal segment ids (varlen packing, flash_attn.h:41-42).
      window: (left, right) local-attention window; -1 = unbounded side.
      scale: defaults to D ** -0.5 (softmax_scale, flash_attn.h:27).
      dropout_rate + dropout_rng: reproducible dropout on the probability
        matrix, scaled by 1/keep (flash_attn.h:26,33-34).
      return_lse: also return LSE in [B, H, Sq] layout (flash_attn.h:16,74).
      return_softmax: also return the (post-dropout) probability matrix
        [B, H, Sq, Sk] (flash_attn.h:15,30 test hook).

    Returns out [B, Sq, H, D] in q.dtype, then optionally lse, then optionally
    the probability matrix, as a tuple in that order.
    """
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(f"q/k/v must be rank-4 BSHD, got {q.shape}/{k.shape}/{v.shape}")
    batch, seqlen_q, num_heads, head_dim = q.shape
    seqlen_k = k.shape[1]
    if scale is None:
        scale = head_dim**-0.5

    k = _broadcast_kv_heads(k, num_heads)
    v = _broadcast_kv_heads(v, num_heads)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, H, Sq, Sk]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    if logit_softcap is not None:
        # Gemma-2-style capping on the scaled scores, before bias/mask
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    if alibi_slopes is not None:
        # upstream flash-attn semantic: -slope_h * |i + Sk - Sq - j|
        i = jnp.arange(seqlen_q)[:, None] + (seqlen_k - seqlen_q)
        j = jnp.arange(seqlen_k)[None, :]
        sl = jnp.asarray(alibi_slopes, jnp.float32)
        scores = scores - sl[None, :, None, None] * jnp.abs(i - j)[None, None]
    bias = attention_bias(
        seqlen_q=seqlen_q,
        seqlen_k=seqlen_k,
        causal=causal,
        mask=mask,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        window=window,
    )
    if bias is not None:
        scores = scores + bias

    row_max = jnp.max(scores, axis=-1, keepdims=True)
    # Fully-masked rows: define softmax as all-zeros, lse as -inf.
    safe_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    unnorm = jnp.exp(scores - safe_max)
    unnorm = jnp.where(jnp.isfinite(scores), unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    lse = jnp.where(
        denom[..., 0] > 0.0,
        safe_max[..., 0] + jnp.log(jnp.maximum(denom[..., 0], 1e-37)),
        NEG_INF,
    )
    probs = jnp.where(denom > 0.0, unnorm / jnp.maximum(denom, 1e-37), 0.0)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf).astype(q.dtype)

    results = (out,)
    if return_lse:
        results += (lse,)
    if return_softmax:
        results += (probs,)
    return results if len(results) > 1 else out


def mha_reference_vjp(
    q, k, v, dout, *, causal=False, mask=None, q_segment_ids=None,
    kv_segment_ids=None, window=None, scale=None,
):
    """Gradients of the oracle via jax.grad — the oracle for Pallas backward
    kernels (flash_attn.h:68-134 semantics without dropout)."""

    def loss(q_, k_, v_):
        out = mha_reference(
            q_, k_, v_, causal=causal, mask=mask, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, window=window, scale=scale,
        )
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
