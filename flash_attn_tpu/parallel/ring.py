"""Ring attention: sequence-parallel exact attention over an ICI ring.

Each device holds a KV shard; KV blocks rotate around the ring via
``ppermute`` while each device accumulates its queries' partial attention,
merging per step with the LSE algebra (ops/lse.py) — the quantity the
reference exposes as softmax_lse (flash_attn.h:16) is exactly what makes
this exact, not approximate.

Used inside ``shard_map`` over the sequence axis, with EXPLICIT double
buffering: each scan step issues the ppermute of its KV buffers before the
attention kernel that consumes the local copies, so the async-collective
split (start before the kernel, done at the carry) keeps step i+1's ICI
transfer in flight under step i's compute — SURVEY.md §5 "explicit overlap
via shard_map + ppermute double-buffering".  (A Pallas RDMA ring with
per-block pltpu.make_async_remote_copy remains the further step; it needs
real multi-chip ICI to validate, which this environment lacks.)

Causal handling: global block positions decide each step's mask — earlier KV
blocks attend fully, the diagonal block causally, later blocks are skipped
entirely (lax.switch on the three cases keeps the skipped steps free).

Training (flash_attn.h:68-134 — backward is half the reference API): the
ring is differentiable via ``jax.custom_vjp``.  The backward rotates
(k, v, dk, dv) together around the same ring: at each step the local device
recomputes its tile gradients from the *merged* LSE (the FA2 recompute
trick — exp(s - lse_full) is the globally-normalized probability, so
per-step partial gradients sum exactly), accumulates dq locally and dk/dv
into the rotating buffers, which arrive back at their home device after a
full loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.ops.flash_bwd import flash_bwd
from flash_attn_tpu.ops.flash_fwd import flash_fwd
from flash_attn_tpu.ops.lse import lse_merge2

NEG_INF = float("-inf")


def _ring_perm(n):
    return [(i, (i + 1) % n) for i in range(n)]  # send KV to the next device


def _ring_scan_fwd(q, k, v, *, axis_name, causal, scale, interpret):
    """The forward ring scan. Returns (out [B,S_loc,H,D], lse [B,H,S_loc])."""
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    batch, s_loc, num_heads, head_dim = q.shape
    perm = _ring_perm(n)

    def step(carry, _):
        out, lse, kc, vc, kv_idx = carry
        # Double buffering, explicitly: the transfer of this step's KV to
        # the neighbor is issued BEFORE the attention kernel that consumes
        # the local copy, so XLA's async-collective split (ppermute-start
        # here, ppermute-done at the carry) keeps the ICI transfer for step
        # i+1 in flight under step i's compute.  The incoming buffers
        # (kn, vn) are the spare of a classic two-buffer rotation.
        kn = jax.lax.ppermute(kc, axis_name, perm)
        vn = jax.lax.ppermute(vc, axis_name, perm)

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

        # merge partials: lse layouts [B,H,S] -> align to out [B,H,S,D]
        out_new, lse_new = lse_merge2(
            out,
            lse,
            jnp.swapaxes(o_i, 1, 2),  # [B,H,S,D]
            lse_i,
        )
        kv_idx = (kv_idx - 1) % n
        return (out_new, lse_new, kn, vn, kv_idx), None

    out0 = jnp.zeros((batch, num_heads, s_loc, head_dim), jnp.float32)
    lse0 = jnp.full((batch, num_heads, s_loc), NEG_INF, jnp.float32)
    (out, lse, _, _, _), _ = jax.lax.scan(
        step, (out0, lse0, k, v, my), None, length=n
    )
    return jnp.swapaxes(out, 1, 2).astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_core(q, k, v, axis_name, causal, scale, interpret):
    out, _ = _ring_scan_fwd(
        q, k, v, axis_name=axis_name, causal=causal, scale=scale,
        interpret=interpret,
    )
    return out


def _ring_core_fwd(q, k, v, axis_name, causal, scale, interpret):
    out, lse = _ring_scan_fwd(
        q, k, v, axis_name=axis_name, causal=causal, scale=scale,
        interpret=interpret,
    )
    return out, (q, k, v, out, lse)


def _ring_core_bwd(axis_name, causal, scale, interpret, res, dout):
    q, k, v, out, lse = res
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = _ring_perm(n)
    kv_shape = k.shape  # [B, S_loc, Hk, D]

    def step(carry, _):
        dq, kc, vc, dkc, dvc, kv_idx = carry
        # kv transfers issue before the recompute kernels (double buffering,
        # as in the forward); dk/dv accumulators can't — they depend on this
        # step's grads — so only the 2 independent transfers overlap compute.
        kn = jax.lax.ppermute(kc, axis_name, perm)
        vn = jax.lax.ppermute(vc, axis_name, perm)

        def grads_full(_):
            g = flash_bwd(
                q, kc, vc, out, lse, dout, causal=False, scale=scale,
                interpret=interpret,
            )
            return tuple(x.astype(jnp.float32) for x in g)

        def grads_diag(_):
            g = flash_bwd(
                q, kc, vc, out, lse, dout, causal=True, scale=scale,
                interpret=interpret,
            )
            return tuple(x.astype(jnp.float32) for x in g)

        def grads_skip(_):
            return (
                jnp.zeros(q.shape, jnp.float32),
                jnp.zeros(kv_shape, jnp.float32),
                jnp.zeros(kv_shape, jnp.float32),
            )

        if causal:
            branch = jnp.where(kv_idx < my, 0, jnp.where(kv_idx == my, 1, 2))
            dq_i, dk_i, dv_i = jax.lax.switch(
                branch, [grads_full, grads_diag, grads_skip], None
            )
        else:
            dq_i, dk_i, dv_i = grads_full(None)

        dq = dq + dq_i
        # rotate the gradient accumulators with the KV shard; after a full
        # loop each (dk, dv) is back on its home device.
        dkc = jax.lax.ppermute(dkc + dk_i, axis_name, perm)
        dvc = jax.lax.ppermute(dvc + dv_i, axis_name, perm)
        kv_idx = (kv_idx - 1) % n
        return (dq, kn, vn, dkc, dvc, kv_idx), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(kv_shape, jnp.float32)
    dv0 = jnp.zeros(kv_shape, jnp.float32)
    (dq, _, _, dk, dv, _), _ = jax.lax.scan(
        step, (dq0, k, v, dk0, dv0, my), None, length=n
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


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
    Differentiable: jax.grad flows through the reverse ring (dk/dv rotate
    home), ≙ flash_attn_bwd semantics (flash_attn.h:68-99) distributed.
    """
    return _ring_core(q, k, v, axis_name, causal, scale, interpret)


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
