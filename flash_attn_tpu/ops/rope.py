"""Rotary position embeddings (RoPE) — shared math for the model layers and
the in-kernel q-side rotation in the FlashAttention forward.

The reference ABI has no RoPE (rotation happens in the consumer framework
before flash_attn_fwd is called, flash_attn.h:10-12 takes post-rotation q/k).
On TPU the q-side rotation is worth folding *into* the attention kernel:
rotating q outside costs a full [B,S,H,D] HBM round trip (read unrotated +
write rotated) that the kernel then re-reads.  K-side rotation stays outside
because the rotated K is exactly what the KV cache must store anyway — XLA
fuses that rotation into the cache-append elementwise chain.

Convention: rotate-half (Llama / HF NEOX style).  cos/sin carry the *angle
tables*, shape [..., S, D/2], broadcast over heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(positions, head_dim, theta, dtype=jnp.float32):
    """positions [...] -> cos/sin [..., head_dim//2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def rope_rotate(x, cos, sin):
    """x [..., S, H, D]; cos/sin [..., S, D/2] (broadcast over heads)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[..., None, :]
    s = sin[..., None, :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1
    ).astype(x.dtype)


def rope_unrotate(x, cos, sin):
    """Inverse rotation (R is orthogonal: R^-1 = R(-angle)).  Used by the
    attention backward to pull dq back through an in-kernel q rotation."""
    return rope_rotate(x, cos, -sin)
