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


def moe_ffn_ep_a2a(x, router_w, w_gate, w_up, w_down, *, axis_name: str,
                   top_k: int, capacity: int):
    """Capacity-based all_to_all EP dispatch (the GShard/Switch scale-up
    path; replaces the dense O(T*E) combine of moe_ffn_ep for real MoE
    serving where every device computing router weights for all experts'
    tokens is the wrong shape).

    x: [T_loc, H] — THIS device's tokens (tokens are data-sharded over the
    same axis as experts, the standard DPxEP layout); w_* [E_loc, ...] this
    device's experts; router_w [H, E_global] replicated.

    Flow (all shapes static — no data-dependent control flow under jit):
      route top-k -> per-(token, choice) slot in the target expert's
      capacity buffer (token-major cumsum; slots >= capacity DROP, exactly
      GShard's overflow rule) -> scatter into [E, C, H] send buffer ->
      all_to_all puts each expert's C*n slots on its home device ->
      dense [E_loc, n*C, H] expert FFN -> all_to_all back -> gather each
      (token, choice)'s result and combine with its router weight.
    Communication: 2 all_to_alls of E*C*H instead of a psum of T*H per
    device; expert compute is dense and local.
    """
    n = jax.lax.axis_size(axis_name)
    e_loc = w_gate.shape[0]
    e_global = router_w.shape[1]
    assert e_global == n * e_loc, (e_global, n, e_loc)
    t_loc, hidden = x.shape

    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    topv, topi = jax.lax.top_k(logits, top_k)  # [T, k]
    wts = jax.nn.softmax(topv, axis=-1)  # [T, k]

    # slot of each (t, k) within its expert's capacity, token-major order
    onehot = jax.nn.one_hot(topi.reshape(-1), e_global, dtype=jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) - 1  # [T*k, E]
    slot = jnp.sum(pos * onehot, axis=1)  # [T*k]
    eid = topi.reshape(-1)
    keep = slot < capacity
    slot_safe = jnp.where(keep, slot, capacity)  # OOB lane -> dropped

    # scatter tokens into the per-expert capacity buffers [E, C, H]
    x_rep = jnp.repeat(x, top_k, axis=0)  # [T*k, H]
    buf = jnp.zeros((e_global, capacity, hidden), x.dtype)
    buf = buf.at[eid, slot_safe].set(x_rep, mode="drop")

    # expert-home exchange: [E=n*E_loc, C, H] -> [E_loc, n*C, H] on the
    # expert's device (all_to_all splits the leading device-block axis)
    buf = buf.reshape(n, e_loc, capacity, hidden)
    buf = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0)
    toks = jnp.swapaxes(buf, 0, 1).reshape(e_loc, n * capacity, hidden)

    h = toks.astype(jnp.float32)
    gate = jnp.einsum("ech,ehf->ecf", h, w_gate.astype(jnp.float32))
    up = jnp.einsum("ech,ehf->ecf", h, w_up.astype(jnp.float32))
    out = jnp.einsum(
        "ecf,efh->ech", jax.nn.silu(gate) * up, w_down.astype(jnp.float32)
    ).astype(x.dtype)

    # return trip: [E_loc, n*C, H] -> [E, C, H] back on the token's device
    out = jnp.swapaxes(
        out.reshape(e_loc, n, capacity, hidden), 0, 1
    )  # [n, E_loc, C, H]
    out = jax.lax.all_to_all(out, axis_name, split_axis=0, concat_axis=0)
    out = out.reshape(e_global, capacity, hidden)

    # gather each (t, k)'s expert output; dropped slots contribute zero
    taken = out.at[eid, slot_safe].get(
        mode="fill", fill_value=0
    )  # [T*k, H]
    w_eff = (wts.reshape(-1) * keep).astype(jnp.float32)
    y = jnp.sum(
        (taken.astype(jnp.float32) * w_eff[:, None]).reshape(
            t_loc, top_k, hidden
        ),
        axis=1,
    )
    return y.astype(x.dtype)


def make_moe_ffn_a2a(mesh, *, axis_name="ep", top_k: int = 2,
                     capacity: int | None = None, capacity_factor: float = 1.25,
                     tokens_per_device: int | None = None,
                     num_experts: int | None = None):
    """shard_map wrapper for the capacity/all_to_all EP path.  x is
    token-sharded [T_global, H] over ``axis_name``; expert weights sharded
    on their leading axis; router replicated.  capacity defaults to
    ceil(T_loc * top_k / E) * capacity_factor (GShard convention)."""
    n = mesh.shape[axis_name]

    def body(x, router_w, w_gate, w_up, w_down):
        cap = capacity
        if cap is None:
            e = router_w.shape[1]
            cap = int(-(-x.shape[0] * top_k // e) * capacity_factor) or 1
        return moe_ffn_ep_a2a(
            x, router_w, w_gate, w_up, w_down,
            axis_name=axis_name, top_k=top_k, capacity=cap,
        )

    del n, tokens_per_device, num_experts
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
