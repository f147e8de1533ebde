"""Ring attention: sequence-parallel exact attention over an ICI ring.

Each device holds a KV shard; KV blocks rotate around the ring via
``ppermute`` while each device accumulates its queries' partial attention,
merging per step with the LSE algebra (ops/lse.py) — the quantity the
reference exposes as softmax_lse (flash_attn.h:16) is exactly what makes
this exact, not approximate.

Used inside ``shard_map`` over the sequence axis; XLA overlaps the ppermute
with the flash kernel of the next step (double buffering happens at the XLA
scheduling level; an explicit Pallas RDMA ring is a later optimisation).

Causal handling: global block positions decide each step's mask — earlier KV
blocks attend fully, the diagonal block causally, later blocks are skipped
entirely (lax.cond on the three cases keeps the skipped steps free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.ops.flash_fwd import flash_fwd
from flash_attn_tpu.ops.lse import lse_merge2

NEG_INF = float("-inf")


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Shard-local ring attention body (call inside shard_map).

    q, k, v: the *local* shards [B, S_loc, H, D] of a sequence sharded over
    ``axis_name``.  Returns the local out shard [B, S_loc, H, D].
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    batch, s_loc, num_heads, head_dim = q.shape

    perm = [(i, (i + 1) % n) for i in range(n)]  # send KV to the next device

    def causal_bias(kv_idx):
        """Additive bias for the diagonal block only (block-causal)."""
        row = jnp.arange(s_loc)[:, None]
        col = jnp.arange(s_loc)[None, :]
        return jnp.where(col <= row, 0.0, NEG_INF)[None, None].astype(jnp.float32)

    def step(carry, _):
        out, lse, kc, vc, kv_idx = carry

        def attend_full(_):
            o, l = flash_fwd(q, kc, vc, scale=scale, interpret=interpret)
            return o.astype(jnp.float32), l

        def attend_diag(_):
            o, l = flash_fwd(
                q, kc, vc, causal=True, scale=scale, interpret=interpret
            )
            return o.astype(jnp.float32), l

        def attend_skip(_):
            return (
                jnp.zeros((batch, s_loc, num_heads, head_dim), jnp.float32),
                jnp.full((batch, num_heads, s_loc), NEG_INF, jnp.float32),
            )

        if causal:
            branch = jnp.where(kv_idx < my, 0, jnp.where(kv_idx == my, 1, 2))
            o_i, lse_i = jax.lax.switch(
                branch, [attend_full, attend_diag, attend_skip], None
            )
        else:
            o_i, lse_i = attend_full(None)

        # merge partials: lse layouts [B,H,S] -> align to out [B,S,H]
        out_new, lse_new = lse_merge2(
            out,
            lse,
            jnp.swapaxes(o_i, 1, 2),  # [B,H,S,D]
            lse_i,
        )
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        kv_idx = (kv_idx - 1) % n
        return (out_new, lse_new, kc, vc, kv_idx), None

    out0 = jnp.zeros((batch, num_heads, s_loc, head_dim), jnp.float32)
    lse0 = jnp.full((batch, num_heads, s_loc), NEG_INF, jnp.float32)
    (out, lse, _, _, _), _ = jax.lax.scan(
        step, (out0, lse0, k, v, my), None, length=n
    )
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def make_ring_attention(mesh, *, axis_name="sp", causal=False, scale=None,
                        interpret=None):
    """shard_map-wrapped ring attention over the mesh's sequence axis.

    Returns fn(q, k, v) on globally-shaped [B, S, H, D] arrays sharded
    along S.
    """
    body = functools.partial(
        ring_attention, axis_name=axis_name, causal=causal, scale=scale,
        interpret=interpret,
    )
    spec = P(None, axis_name, None, None)
    return jax.shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
