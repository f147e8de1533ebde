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
via shard_map + ppermute double-buffering".  (parallel/rdma_ring.py holds
the per-block pltpu.make_async_remote_copy variant; it needs real
multi-chip ICI to validate for perf, which this environment lacks.)

Two sequence layouts:

- ``layout="contiguous"`` — device d holds tokens [d*S_loc, (d+1)*S_loc).
  Causal masking per step is the classic three-way split: earlier KV shards
  attend fully, the diagonal shard causally, later shards are skipped
  (lax.switch keeps skipped steps nearly free).  Simple, but causally
  LOAD-IMBALANCED: device 0 does 1 live step while device n-1 does n, so
  wall-clock is ~2x the mean at large n.

- ``layout="striped"`` — device d holds every n-th token starting at d
  (global token g lives at local slot g // n on device g % n; see
  ``stripe_sequence``).  Every (q-shard, kv-shard) pair is then EXACTLY
  triangular: local kv slot j of source s is visible to local q slot i of
  device d iff j*n + s <= i*n + d, i.e. j <= i when s <= d and j <= i-1
  when s > d.  Both cases hit the kernel's static-causal block-skip fast
  path (the strict case by dropping the last KV row, which shifts the
  bottom-right alignment by exactly -1).  Per-step work is identical on
  every device at every step — the causal ring is flops-balanced by
  construction (tests/test_parallel.py asserts the balance combinatorially).

Feature parity with the single-device kernel (flash_attn.h:26,33-36 on a
distributed surface): bias (columns sliced per step from a q-sharded,
full-K bias), sliding ``window`` + causal (contiguous layout: global
positions are threaded into the kernels, whose window mask evaluates
positions when given), ``logit_softcap``, and reproducible counter-based
dropout (per-(q-shard, kv-shard) seed offsets; the backward replays the
identical masks because the same offsets are reconstructed from the carried
kv index).

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


def stripe_sequence(x, n, axis=1):
    """Contiguous -> striped sequence order: after this permutation, an
    even contiguous sharding of ``axis`` over n devices puts global token g
    on device g % n at local slot g // n.  Apply once to q/k/v (and to both
    axes of a bias) before a striped-layout ring; positions-dependent
    preprocessing (RoPE) must run BEFORE striping (or use striped position
    arrays)."""
    s = x.shape[axis]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by ring size {n}")
    parts = list(x.shape[:axis]) + [s // n, n] + list(x.shape[axis + 1:])
    xr = x.reshape(parts)
    return jnp.moveaxis(xr, axis + 1, axis).reshape(x.shape)


def unstripe_sequence(x, n, axis=1):
    """Inverse of ``stripe_sequence``."""
    s = x.shape[axis]
    parts = list(x.shape[:axis]) + [n, s // n] + list(x.shape[axis + 1:])
    xr = x.reshape(parts)
    return jnp.moveaxis(xr, axis, axis + 1).reshape(x.shape)


def _step_seed(seed, my, kv_idx, n):
    """Distinct dropout seed per (q-shard, kv-shard) pair.  The kernel mixes
    (seed, batch, head, absolute-local coords); shards reuse local coords,
    so the pair id must enter through the seed for masks to be independent
    across the ring.  Same formula in fwd and bwd = exact replay."""
    return seed + (my * n + kv_idx).astype(jnp.int32)


def _slice_bias_cols(bias, kv_idx, s_loc):
    """bias [B, H, S_loc, S_total] -> this step's [B, H, S_loc, s_loc]
    column block (column order matches the layout: stripe-permute the bias
    KV axis for striped rings)."""
    if bias is None:
        return None
    return jax.lax.dynamic_slice_in_dim(bias, kv_idx * s_loc, s_loc, axis=3)


def _ring_scan_fwd(q, k, v, bias, seed, *, axis_name, causal, scale, layout,
                   window, logit_softcap, dropout_rate, interpret):
    """The forward ring scan. Returns (out [B,S_loc,H,D], lse [B,H,S_loc])."""
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    batch, s_loc, num_heads, head_dim = q.shape
    perm = _ring_perm(n)
    striped = layout == "striped"
    # global positions (contiguous layout): thread window/causal masks
    # through the kernels' positions path so they see global coordinates.
    use_pos = window is not None and not striped
    if use_pos and not causal:
        raise NotImplementedError(
            "ring window requires causal=True (the kernel positions path "
            "implies kv_pos <= q_pos)"
        )
    iota = jnp.arange(s_loc, dtype=jnp.int32)[None]  # [1, S_loc]
    qpos = my.astype(jnp.int32) * s_loc + jnp.broadcast_to(iota, (batch, s_loc))

    def attend(kc, vc, kv_idx, *, causal_step, strict):
        kw = dict(
            scale=scale, logit_softcap=logit_softcap,
            dropout_rate=dropout_rate, interpret=interpret,
            bias=_slice_bias_cols(bias, kv_idx, s_loc),
            dropout_seed=_step_seed(seed, my, kv_idx, n),
        )
        if use_pos:
            kpos = kv_idx.astype(jnp.int32) * s_loc + jnp.broadcast_to(
                iota, (batch, s_loc)
            )
            o, l = flash_fwd(
                q, kc, vc, q_positions=qpos, kv_positions=kpos,
                window=window, **kw,
            )
        elif strict:
            # striped, source AFTER me: strict causal j <= i-1 == static
            # causal with the last KV row dropped (bottom-right shift -1);
            # keeps the kernel's whole-block causal skip.
            kb = kw.pop("bias")
            if kb is not None:
                kb = kb[..., : s_loc - 1]
            o, l = flash_fwd(
                q, kc[:, : s_loc - 1], vc[:, : s_loc - 1], causal=True,
                bias=kb, **kw,
            )
        else:
            o, l = flash_fwd(q, kc, vc, causal=causal_step, **kw)
        return o.astype(jnp.float32), l

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

        def attend_skip(_):
            return (
                jnp.zeros((batch, s_loc, num_heads, head_dim), jnp.float32),
                jnp.full((batch, num_heads, s_loc), NEG_INF, jnp.float32),
            )

        if not causal:
            o_i, lse_i = attend(kc, vc, kv_idx, causal_step=False, strict=False)
        elif striped:
            # every step is triangular — flops-balanced causal ring
            o_i, lse_i = jax.lax.cond(
                kv_idx <= my,
                lambda _: attend(kc, vc, kv_idx, causal_step=True, strict=False),
                lambda _: attend(kc, vc, kv_idx, causal_step=True, strict=True),
                None,
            )
        else:
            branch = jnp.where(kv_idx < my, 0, jnp.where(kv_idx == my, 1, 2))
            o_i, lse_i = jax.lax.switch(
                branch,
                [
                    lambda _: attend(
                        kc, vc, kv_idx, causal_step=use_pos, strict=False
                    ),
                    lambda _: attend(kc, vc, kv_idx, causal_step=True,
                                     strict=False),
                    attend_skip,
                ],
                None,
            )

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _ring_core(q, k, v, bias, seed, axis_name, causal, scale, layout, window,
               logit_softcap, dropout_rate, interpret):
    out, _ = _ring_scan_fwd(
        q, k, v, bias, seed, axis_name=axis_name, causal=causal, scale=scale,
        layout=layout, window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return out


def _ring_core_fwd(q, k, v, bias, seed, axis_name, causal, scale, layout,
                   window, logit_softcap, dropout_rate, interpret):
    out, lse = _ring_scan_fwd(
        q, k, v, bias, seed, axis_name=axis_name, causal=causal, scale=scale,
        layout=layout, window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return out, (q, k, v, bias, seed, out, lse)


def _ring_core_bwd(axis_name, causal, scale, layout, window, logit_softcap,
                   dropout_rate, interpret, res, dout):
    q, k, v, bias, seed, out, lse = res
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = _ring_perm(n)
    kv_shape = k.shape  # [B, S_loc, Hk, D]
    batch, s_loc = q.shape[0], q.shape[1]
    striped = layout == "striped"
    use_pos = window is not None and not striped
    want_dbias = bias is not None
    iota = jnp.arange(s_loc, dtype=jnp.int32)[None]
    qpos = my.astype(jnp.int32) * s_loc + jnp.broadcast_to(iota, (batch, s_loc))

    def grads(kc, vc, kv_idx, *, causal_step, strict):
        kw = dict(
            scale=scale, logit_softcap=logit_softcap,
            dropout_rate=dropout_rate, interpret=interpret,
            bias=_slice_bias_cols(bias, kv_idx, s_loc),
            dropout_seed=_step_seed(seed, my, kv_idx, n),
            want_dbias=want_dbias,
        )
        if use_pos:
            kpos = kv_idx.astype(jnp.int32) * s_loc + jnp.broadcast_to(
                iota, (batch, s_loc)
            )
            g = flash_bwd(
                q, kc, vc, out, lse, dout, q_positions=qpos,
                kv_positions=kpos, window=window, **kw,
            )
        elif strict:
            kb = kw.pop("bias")
            if kb is not None:
                kb = kb[..., : s_loc - 1]
            g = flash_bwd(
                q, kc[:, : s_loc - 1], vc[:, : s_loc - 1], out, lse, dout,
                causal=True, bias=kb, **kw,
            )
            pad = [(0, 0)] * 4
            pad[1] = (0, 1)
            pad_b = [(0, 0)] * 4
            pad_b[3] = (0, 1)
            g = (
                g[0],
                jnp.pad(g[1], pad),  # last KV row saw no queries: zero grad
                jnp.pad(g[2], pad),
            ) + ((jnp.pad(g[3], pad_b),) if want_dbias else ())
        else:
            g = flash_bwd(q, kc, vc, out, lse, dout, causal=causal_step, **kw)
        return tuple(x.astype(jnp.float32) for x in g)

    def step(carry, _):
        dq, kc, vc, dkc, dvc, dbias_acc, kv_idx = carry
        # kv transfers issue before the recompute kernels (double buffering,
        # as in the forward); dk/dv accumulators can't — they depend on this
        # step's grads — so only the 2 independent transfers overlap compute.
        kn = jax.lax.ppermute(kc, axis_name, perm)
        vn = jax.lax.ppermute(vc, axis_name, perm)

        def grads_skip(_):
            z = (
                jnp.zeros(q.shape, jnp.float32),
                jnp.zeros(kv_shape, jnp.float32),
                jnp.zeros(kv_shape, jnp.float32),
            )
            if want_dbias:
                z = z + (jnp.zeros(
                    bias.shape[:3] + (s_loc,), jnp.float32
                ),)
            return z

        if not causal:
            g = grads(kc, vc, kv_idx, causal_step=False, strict=False)
        elif striped:
            g = jax.lax.cond(
                kv_idx <= my,
                lambda _: grads(kc, vc, kv_idx, causal_step=True, strict=False),
                lambda _: grads(kc, vc, kv_idx, causal_step=True, strict=True),
                None,
            )
        else:
            branch = jnp.where(kv_idx < my, 0, jnp.where(kv_idx == my, 1, 2))
            g = jax.lax.switch(
                branch,
                [
                    lambda _: grads(
                        kc, vc, kv_idx, causal_step=use_pos, strict=False
                    ),
                    lambda _: grads(kc, vc, kv_idx, causal_step=True,
                                    strict=False),
                    grads_skip,
                ],
                None,
            )
        dq_i, dk_i, dv_i = g[0], g[1], g[2]

        dq = dq + dq_i
        if want_dbias:
            # scatter this step's bias-column gradient into the full-K
            # accumulator at the column block it was sliced from
            dbias_acc = jax.lax.dynamic_update_slice_in_dim(
                dbias_acc,
                jax.lax.dynamic_slice_in_dim(
                    dbias_acc, kv_idx * s_loc, s_loc, axis=3
                ) + g[3],
                kv_idx * s_loc,
                axis=3,
            )
        # rotate the gradient accumulators with the KV shard; after a full
        # loop each (dk, dv) is back on its home device.
        dkc = jax.lax.ppermute(dkc + dk_i, axis_name, perm)
        dvc = jax.lax.ppermute(dvc + dv_i, axis_name, perm)
        kv_idx = (kv_idx - 1) % n
        return (dq, kn, vn, dkc, dvc, dbias_acc, kv_idx), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(kv_shape, jnp.float32)
    dv0 = jnp.zeros(kv_shape, jnp.float32)
    dbias0 = (
        jnp.zeros(bias.shape, jnp.float32) if want_dbias else jnp.zeros((0,))
    )
    (dq, _, _, dk, dv, dbias_acc, _), _ = jax.lax.scan(
        step, (dq0, k, v, dk0, dv0, dbias0, my), None, length=n
    )
    dbias = dbias_acc.astype(bias.dtype) if want_dbias else None
    import numpy as np

    dseed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias,
        dseed,
    )


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: float | None = None,
    layout: str = "contiguous",
    bias: jax.Array | None = None,
    window: tuple[int, int] | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    interpret: bool | None = None,
):
    """Shard-local ring attention body (call inside shard_map).

    q, k, v: the *local* shards [B, S_loc, H, D] of a sequence sharded over
    ``axis_name``.  Returns the local out shard [B, S_loc, H, D].
    Differentiable: jax.grad flows through the reverse ring (dk/dv rotate
    home), ≙ flash_attn_bwd semantics (flash_attn.h:68-99) distributed.

    layout: "contiguous" (simple; causally imbalanced ~2x) or "striped"
    (flops-balanced causal; inputs must be in striped sequence order —
    ``stripe_sequence`` — and the output comes back striped).

    bias [B, H, S_loc, S_total]: additive attention bias, q-rows local,
    K columns FULL (in layout order); differentiable.  window (left, right)
    — contiguous layout + causal only, evaluated on global positions.
    logit_softcap and reproducible dropout match flash_attention's contract
    (flash_attn.h:26,33-36) on the distributed surface.
    """
    if layout not in ("contiguous", "striped"):
        raise ValueError(f"unknown ring layout {layout!r}")
    if layout == "striped" and window is not None:
        raise NotImplementedError("window + striped ring layout")
    return _ring_core(
        q, k, v, bias, jnp.asarray(dropout_seed, jnp.int32), axis_name,
        causal, scale, layout, window, logit_softcap, float(dropout_rate),
        interpret,
    )


def make_ring_attention(mesh, *, axis_name="sp", causal=False, scale=None,
                        layout="contiguous", has_bias=False, window=None,
                        logit_softcap=None, dropout_rate=0.0,
                        interpret=None):
    """shard_map-wrapped ring attention over the mesh's sequence axis.

    Returns fn(q, k, v[, bias][, dropout_seed]) on globally-shaped
    [B, S, H, D] arrays sharded along S (striped layouts expect
    stripe_sequence order; bias [B, H, S, S] is sharded on its q axis).
    """
    spec = P(None, axis_name, None, None)
    bias_spec = P(None, None, axis_name, None)

    def body(q, k, v, bias=None, dropout_seed=0):
        return ring_attention(
            q, k, v, axis_name=axis_name, causal=causal, scale=scale,
            layout=layout, bias=bias, window=window,
            logit_softcap=logit_softcap, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, interpret=interpret,
        )

    if has_bias:
        return jax.shard_map(
            lambda q, k, v, bias: body(q, k, v, bias),
            mesh=mesh,
            in_specs=(spec, spec, spec, bias_spec),
            out_specs=spec,
            check_vma=False,
        )
    return jax.shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
