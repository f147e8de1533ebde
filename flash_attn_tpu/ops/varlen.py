"""Varlen (ragged/packed batch) utilities.

The reference's varlen entry points (flash_attn.h:38-66,101-134) address
packed ``total x h x d`` tensors through ``cu_seqlens_q/k`` int32 prefix sums
of length b+1 (flash_attn.h:41-42).  The TPU-native representation is
*segment ids* over the packed token axis: equal ids attend to each other,
id 0 marks padding.  These helpers convert at the API edge so users of the
reference can keep their cu_seqlens while the kernels see segment ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cu_seqlens_to_segment_ids(cu_seqlens: jax.Array, total: int) -> jax.Array:
    """[b+1] int32 prefix sums -> [total] int32 segment ids (1-based; 0 = pad).

    Tokens in sequence i (i.e. positions [cu[i], cu[i+1])) get id i+1;
    positions >= cu[-1] get 0 (padding).
    """
    cu_seqlens = cu_seqlens.astype(jnp.int32)
    pos = jnp.arange(total, dtype=jnp.int32)
    # id = number of boundaries <= pos, among cu_seqlens[1:]; +1 offset so
    # the first sequence is id 1. Padding (pos >= cu[-1]) forced to 0.
    ids = jnp.sum(pos[:, None] >= cu_seqlens[None, 1:], axis=1) + 1
    return jnp.where(pos < cu_seqlens[-1], ids.astype(jnp.int32), 0)


def segment_ids_to_positions(segment_ids: jax.Array) -> jax.Array:
    """Per-token position within its segment (for RoPE on packed batches)."""
    total = segment_ids.shape[0]
    idx = jnp.arange(total, dtype=jnp.int32)

    def scan_fn(carry, x):
        prev_id, prev_pos = carry
        seg, _ = x
        pos = jnp.where(seg == prev_id, prev_pos + 1, 0)
        return (seg, pos), pos

    (_, _), positions = jax.lax.scan(
        scan_fn, (jnp.int32(-1), jnp.int32(-1)), (segment_ids, idx)
    )
    return positions


def seqlens_to_cu_seqlens(seqlens: jax.Array) -> jax.Array:
    """[b] lengths -> [b+1] cumulative prefix sums (flash_attn.h:41 format)."""
    seqlens = seqlens.astype(jnp.int32)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens)])


def pack_sequences(seqs, total: int, head_shape):
    """Pack a list of [s_i, *head_shape] arrays into ([total, *head_shape],
    cu_seqlens, segment_ids). Pure-numpy-side helper for tests and data prep."""
    import numpy as np

    lens = [int(s.shape[0]) for s in seqs]
    cu = np.zeros(len(seqs) + 1, np.int32)
    cu[1:] = np.cumsum(lens)
    if cu[-1] > total:
        raise ValueError(f"sequences total {cu[-1]} exceed capacity {total}")
    packed = np.zeros((total, *head_shape), np.asarray(seqs[0]).dtype)
    for i, s in enumerate(seqs):
        packed[cu[i] : cu[i + 1]] = np.asarray(s)
    seg = np.zeros(total, np.int32)
    for i in range(len(seqs)):
        seg[cu[i] : cu[i + 1]] = i + 1
    return jnp.asarray(packed), jnp.asarray(cu), jnp.asarray(seg)
