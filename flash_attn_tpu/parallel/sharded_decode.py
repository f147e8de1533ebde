"""Sequence-sharded decode: KV cache sharded over the mesh's sequence axis,
one decode step per device shard, exact LSE-merge across shards (BASELINE
config 3: 128k context with KV sharded across hosts).

Each device runs flash_decode on its local KV shard -> partial (out, lse);
partials merge with the same LSE algebra as ring attention, but for decode
the merge is a pair of psums (softmax-style reduction), not a ring — one
collective round regardless of shard count, which is what ICI/DCN wants for
latency-bound decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.ops.decode import flash_decode

NEG_INF = float("-inf")


def sharded_decode(
    q: jax.Array,
    k_shard: jax.Array,
    v_shard: jax.Array,
    *,
    axis_name: str,
    shard_kv_length: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    scale: float | None = None,
    interpret: bool | None = None,
    kv_layout: str = "bshd",
    scale_layout: str = "kv",
    scales_perm_chunk: int | None = None,
):
    """Shard-local body (inside shard_map).

    q: [B, H, D] replicated; k_shard/v_shard: this device's slice of the
    cache — [B, S_loc, Hk, D] (kv_layout='bshd') or [B, Hk, S_loc, D]
    ('bhsd', the engine cache layout); shard_kv_length: [B] valid entries
    in THIS shard (a shard that holds none of a sequence's history passes
    0 and contributes nothing — lse = -inf).

    Returns out [B, H, D] replicated (identical on every device).
    """
    out_i, lse_i = flash_decode(
        q, k_shard, v_shard,
        kv_length=shard_kv_length,
        k_scale=k_scale, v_scale=v_scale,
        scale=scale, interpret=interpret, return_lse=True,
        kv_layout=kv_layout, scale_layout=scale_layout,
        scales_perm_chunk=scales_perm_chunk,
    )  # out [B,H,D], lse [B,H]

    # softmax-style exact merge across shards: two psums + a pmax.
    m = jax.lax.pmax(lse_i, axis_name)  # [B,H]
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - safe_m), 0.0)  # [B,H]
    num = jax.lax.psum(out_i.astype(jnp.float32) * w[..., None], axis_name)
    den = jax.lax.psum(w, axis_name)
    out = jnp.where(den[..., None] > 0, num / jnp.maximum(den[..., None], 1e-37), 0.0)
    return out.astype(q.dtype)


def shard_lengths(length: jax.Array, n_shards: int, shard_size: int):
    """Global per-sequence lengths [B] -> per-shard valid counts
    [n_shards, B] for a capacity axis split into equal contiguous shards."""
    i = jnp.arange(n_shards, dtype=length.dtype)[:, None]
    return jnp.clip(length[None] - i * shard_size, 0, shard_size)


def make_sharded_decode(mesh, *, axis_name="sp", scale=None, interpret=None,
                        quantized=False, kv_layout="bshd",
                        scale_layout="kv", scales_perm_chunk=None):
    """shard_map wrapper: global k/v [B, S, Hk, D] ('bshd') or
    [B, Hk, S, D] ('bhsd') sharded on S over ``axis_name``;
    kv_length_per_shard [n_shards, B] (see shard_lengths).

    scale_layout='lanes' (the KVCache layout, [B, Hk, 1, S]) shards scales
    on the last axis; scales_perm_chunk must divide the per-shard length
    (llama.decode_step_sharded validates)."""
    body = functools.partial(
        sharded_decode, axis_name=axis_name, scale=scale,
        interpret=interpret, kv_layout=kv_layout, scale_layout=scale_layout,
        scales_perm_chunk=scales_perm_chunk,
    )
    if kv_layout == "bhsd":
        kv_spec = P(None, None, axis_name, None)
    else:
        kv_spec = P(None, axis_name, None, None)
    len_spec = P(axis_name, None)

    if quantized:
        if scale_layout == "lanes":
            sc_spec = P(None, None, None, axis_name)
        else:
            sc_spec = kv_spec

        def fn(q, k, v, ks, vs, lens):
            return body(
                q, k, v, shard_kv_length=lens[0], k_scale=ks, v_scale=vs
            )
        in_specs = (P(), kv_spec, kv_spec, sc_spec, sc_spec, len_spec)
    else:
        def fn(q, k, v, lens):
            return body(q, k, v, shard_kv_length=lens[0])
        in_specs = (P(), kv_spec, kv_spec, len_spec)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
