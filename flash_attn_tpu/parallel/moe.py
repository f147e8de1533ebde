"""Expert parallelism (B8 EP): top-k routed MoE FFN with expert-sharded
weights over the mesh's expert axis.

Token routing inside shard_map: every device holds ``experts_per_device``
experts; tokens are dispatched with a dense one-hot combine (capacity-less,
exact — the einsum form) and expert outputs are combined by router weights.
The dense dispatch costs O(tokens * experts) memory for the combine weights
only, which is the standard exact-MoE baseline; capacity-based all_to_all
dispatch is the scale-up path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def router_topk(logits: jax.Array, k: int):
    """logits [T, E] -> (weights [T, E] with only top-k nonzero, softmaxed
    over the selected experts)."""
    topv, topi = jax.lax.top_k(logits, k)
    w = jax.nn.softmax(topv, axis=-1)  # [T, k]
    full = jnp.zeros_like(logits)
    return full.at[jnp.arange(logits.shape[0])[:, None], topi].set(w)


def moe_ffn_reference(x, router_w, w_gate, w_up, w_down, *, top_k: int):
    """Dense oracle: x [T, H]; router_w [H, E]; w_* [E, ...]."""
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    combine = router_topk(logits, top_k)  # [T, E]

    def expert(e):
        h = x.astype(jnp.float32)
        gate = h @ w_gate[e].astype(jnp.float32)
        up = h @ w_up[e].astype(jnp.float32)
        return (jax.nn.silu(gate) * up) @ w_down[e].astype(jnp.float32)

    outs = jnp.stack([expert(e) for e in range(router_w.shape[1])])  # [E, T, H]
    return jnp.einsum("te,eth->th", combine, outs).astype(x.dtype)


def moe_ffn_ep(x, router_w, w_gate, w_up, w_down, *, axis_name: str,
               top_k: int):
    """Shard-local EP body (inside shard_map).

    x: [T, H] replicated tokens; w_gate/w_up/w_down: this device's expert
    slice [E_loc, ...]; router_w [H, E_global] replicated.
    Every device computes its local experts' contribution for all tokens and
    a psum combines — communication = one psum of [T, H], the EP analog of
    TP's row-parallel reduction.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    e_loc = w_gate.shape[0]
    e_global = router_w.shape[1]

    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    combine = router_topk(logits, top_k)  # [T, E_global]
    # my experts' combine columns: [T, E_loc]
    my_cols = jax.lax.dynamic_slice(
        combine, (0, idx * e_loc), (combine.shape[0], e_loc)
    )

    h = x.astype(jnp.float32)
    gate = jnp.einsum("th,ehf->etf", h, w_gate.astype(jnp.float32))
    up = jnp.einsum("th,ehf->etf", h, w_up.astype(jnp.float32))
    act = jax.nn.silu(gate) * up
    outs = jnp.einsum("etf,efh->eth", act, w_down.astype(jnp.float32))
    local = jnp.einsum("te,eth->th", my_cols, outs)
    return jax.lax.psum(local, axis_name).astype(x.dtype)


def make_moe_ffn(mesh, *, axis_name="tp", top_k: int = 2):
    body = functools.partial(moe_ffn_ep, axis_name=axis_name, top_k=top_k)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
