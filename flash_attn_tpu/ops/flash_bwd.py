"""Pallas FlashAttention-2 backward kernels (TPU).

Semantics of ``flash_attn_bwd`` / ``flash_attn_varlen_bwd``
(flash_attn.h:68-134): recompute P from (q, k, lse), consume dout, produce
(dq, dk, dv) with fp32 accumulation.

The reference parallelises over K with ``num_splits`` and accumulates dq
through an fp32 ``dq_accum`` buffer with atomics (flash_attn.h:79,94).  TPUs
have no atomics, so the same math is restructured into two grid passes, each
race-free by construction:

- **dq pass**: grid (b, h, q_block, k_block), k innermost — dq tile
  accumulates in VMEM scratch across the sequential k steps (the scratch IS
  the dq_accum, but private to the grid lane, so no atomics).
- **dkv pass**: grid (b, h, k_block, q_block), q innermost — dk/dv tiles
  accumulate across q steps.  GQA: dk/dv are produced per *query* head and
  group-reduced onto the shared KV heads outside the kernel
  (flash_attn.h:22-23 broadcast, transposed).

``delta = rowsum(dout * out)`` — the reference's ``softmax_d`` preprocess
workspace (flash_attn.h:73) — is a cheap fused elementwise+reduce left to XLA.

Dropout replays the identical per-(b,h,qi,ki) counter-seeded mask as the
forward (flash_attn.h:96-97 seed/offset replay).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.ops.flash_fwd import (
    NEG_INF,
    FlashConfig,
    _cdiv,
    _mix_seed,
    _pad_axis,
    dropout_keep_mask,
    rope_rotate_block,
    sdot,
)


def _recompute_p_ds(
    q, k, v, dout, lse_row, delta_row, *,
    row0, col0, block_q, block_k, seqlen_q, seqlen_k, shift,
    causal, window, has_segs, qs, ks, has_pos, qp, kp, has_bias, bias, scale,
    softcap, alibi, dropout_rate, seed_ref, b, h,
):
    """Shared tile math: returns (p_drop, ds_qk, ds_bias) fp32 [bq, bk].

    lse_row / delta_row are [bq, 1] columns; qs is [bq, 1], ks is [1, bk].
    p_drop is the post-dropout probability tile (feeds dv); ds_bias is the
    post-cap score gradient (= dbias); ds_qk additionally chains through
    the softcap tanh (feeds dq and dk).  Without a softcap they are the
    same array.
    """
    # sdot: explicit precision (DEFAULT for bf16) — a raw dot_general here
    # inherits any global jax_default_matmul_precision and "highest" breaks
    # Mosaic bf16 matmuls ("Bad lhs type").
    s = sdot(q, k, (((1,), (1,)), ((), ()))) * scale
    if softcap is not None:
        # forward applied cap*tanh(s/cap); recompute it and keep the tanh
        # for the chain-rule factor below (d/ds = 1 - tanh^2).
        s_tanh = jnp.tanh(s / softcap)
        s = softcap * s_tanh
    if has_bias:
        s = s + bias

    row = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    if alibi is not None:
        # additive constant w.r.t. q/k/v: no chain-rule factor on ds
        colb = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = s - alibi * jnp.abs(row + shift - colb).astype(s.dtype)
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    # Padded q rows (row >= seqlen_q) carry lse = NEG_INF; exp(s - lse)
    # would overflow there, so they must be masked out elementwise.
    mask = (col < seqlen_k) & (row < seqlen_q)
    if causal:
        mask &= col <= row + shift
    if window is not None:
        # local attention (left, right), bottom-right aligned; -1 = open —
        # mirrors the forward kernel's window mask exactly (incl. the
        # positions form used by ring shards / packed varlen batches).
        left, right = window
        wrow, wcol = (qp, kp) if has_pos else (row + shift, col)
        if left >= 0:
            mask &= wcol >= wrow - left
        if right >= 0:
            mask &= wcol <= wrow + right
    if has_segs:
        mask &= qs == ks  # (bq,1) == (1,bk) broadcast
    if has_pos:
        mask &= kp <= qp  # per-sequence causal via positions

    # p = exp(s - lse); fully-masked rows have lse=NEG_INF -> force p=0 via
    # the element mask (never via the subtraction, which would yield exp(0)).
    lse_safe = jnp.maximum(lse_row, NEG_INF / 2)  # [bq, 1]
    p = jnp.where(mask & (lse_row > NEG_INF / 2), jnp.exp(s - lse_safe), 0.0)

    dp_drop = sdot(dout, v, (((1,), (1,)), ((), ())))  # [bq, bk] = dout @ v^T

    if dropout_rate > 0.0:
        keep = dropout_keep_mask(
            seed_ref, b, h, row0, col0, block_q, block_k, dropout_rate
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_drop = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp_drop * inv_keep, 0.0)
    else:
        p_drop = p
        dp = dp_drop

    ds_bias = p * (dp - delta_row)  # delta_row: [bq, 1]
    ds_qk = ds_bias
    if softcap is not None:
        ds_qk = ds_bias * (1.0 - s_tanh * s_tanh)  # through cap*tanh(s/cap)
    return p_drop, ds_qk, ds_bias


def _dq_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, bias_ref, qseg_ref, kseg_ref,
    qpos_ref, kpos_ref, rope_ref, alibi_ref,
    dq_ref,
    dq_scratch,
    *,
    seqlen_q, seqlen_k, block_q, block_k, num_k_blocks,
    causal, window, scale, softcap, dropout_rate, has_bias, has_segs,
    has_pos, has_rope, has_alibi, out_dtype,
):
    b, h, qi, ki = (pl.program_id(i) for i in range(4))
    shift = seqlen_k - seqlen_q

    @pl.when(ki == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    def _body():
        q = q_ref[0, 0]
        if has_rope:
            # q arrives UN-rotated (same contract as the forward's in-kernel
            # rope); the recompute needs R(q).
            q = rope_rotate_block(q, rope_ref[0])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        dout = dout_ref[0, 0]
        lse_row = lse_ref[0, 0]
        delta_row = delta_ref[0, 0]
        _, ds, _ = _recompute_p_ds(
            q, k, v, dout, lse_row, delta_row,
            row0=qi * block_q, col0=ki * block_k,
            block_q=block_q, block_k=block_k,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k, shift=shift,
            causal=causal, window=window, has_segs=has_segs,
            qs=qseg_ref[0] if has_segs else None,
            ks=kseg_ref[0] if has_segs else None,
            has_pos=has_pos,
            qp=qpos_ref[0] if has_pos else None,
            kp=kpos_ref[0] if has_pos else None,
            has_bias=has_bias,
            bias=bias_ref[0, 0].astype(jnp.float32) if has_bias else None,
            scale=scale, softcap=softcap,
            alibi=alibi_ref[0, 0, 0] if has_alibi else None,
            dropout_rate=dropout_rate, seed_ref=seed_ref,
            b=b, h=h,
        )
        dq_scratch[...] += scale * sdot(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ()))
        )

    if causal:
        first_masked_col = qi * block_q + (block_q - 1) + shift + 1
        pl.when(ki * block_k < first_masked_col)(_body)
    else:
        _body()

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq = dq_scratch[...]
        if has_rope:
            # The scratch accumulated d(R q); pull it back through the
            # orthogonal rotation so the emitted dq is w.r.t. un-rotated q.
            dq = rope_rotate_block(dq, rope_ref[0], inverse=True)
        dq_ref[0, 0] = dq.astype(out_dtype)


def _dkv_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, bias_ref, qseg_ref, kseg_ref,
    qpos_ref, kpos_ref, rope_ref, alibi_ref,
    dk_ref, dv_ref, ds_ref,
    dk_scratch, dv_scratch,
    *,
    seqlen_q, seqlen_k, block_q, block_k, num_q_blocks,
    causal, window, scale, softcap, dropout_rate, has_bias, has_segs,
    has_pos, has_rope, has_alibi, out_dtype, want_ds,
):
    b, h, ki, qi = (pl.program_id(i) for i in range(4))
    shift = seqlen_k - seqlen_q

    @pl.when(qi == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    def _body():
        q = q_ref[0, 0]
        if has_rope:
            # recompute AND the dk GEMM below both need R(q): dk = ds^T R(q)
            q = rope_rotate_block(q, rope_ref[0])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        dout = dout_ref[0, 0]
        lse_row = lse_ref[0, 0]
        delta_row = delta_ref[0, 0]
        p_drop, ds, ds_bias = _recompute_p_ds(
            q, k, v, dout, lse_row, delta_row,
            row0=qi * block_q, col0=ki * block_k,
            block_q=block_q, block_k=block_k,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k, shift=shift,
            causal=causal, window=window, has_segs=has_segs,
            qs=qseg_ref[0] if has_segs else None,
            ks=kseg_ref[0] if has_segs else None,
            has_pos=has_pos,
            qp=qpos_ref[0] if has_pos else None,
            kp=kpos_ref[0] if has_pos else None,
            has_bias=has_bias,
            bias=bias_ref[0, 0].astype(jnp.float32) if has_bias else None,
            scale=scale, softcap=softcap,
            alibi=alibi_ref[0, 0, 0] if has_alibi else None,
            dropout_rate=dropout_rate, seed_ref=seed_ref,
            b=b, h=h,
        )
        # dv += P_drop^T @ dout ; dk += scale * dS^T @ q
        dv_scratch[...] += sdot(
            p_drop.astype(dout.dtype), dout, (((0,), (0,)), ((), ()))
        )
        dk_scratch[...] += scale * sdot(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ()))
        )
        if want_ds:
            # dbias = post-cap score gradient; each (qi, ki) tile is
            # visited exactly once in this grid, so a plain tile write is
            # race-free.  Reduced to the broadcastable bias shape outside.
            ds_ref[0, 0] = ds_bias

    if causal:
        # Block (ki, qi) is live iff some (row, col) satisfies col <= row+shift.
        live = ki * block_k <= qi * block_q + (block_q - 1) + shift
        pl.when(live)(_body)
        if want_ds:
            # Dead blocks must still define their ds output tile.
            @pl.when(jnp.logical_not(live))
            def _zero_ds():
                ds_ref[0, 0] = jnp.zeros_like(ds_ref[0, 0])

    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[...].astype(out_dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(out_dtype)


def flash_bwd(
    q, k, v, out, lse, dout,
    *,
    bias=None,
    q_segment_ids=None,
    kv_segment_ids=None,
    q_positions=None,
    kv_positions=None,
    causal=False,
    scale=None,
    dropout_rate=0.0,
    dropout_seed=0,
    window=None,
    rope_cos=None,
    rope_sin=None,
    logit_softcap=None,
    alibi_slopes=None,
    want_dbias=False,
    config: FlashConfig | None = None,
    interpret: bool | None = None,
):
    """Returns (dq, dk, dv), or (dq, dk, dv, dbias) when ``want_dbias``.
    Layouts as flash_fwd (BSHD in/out); lse [B,H,Sq].

    rope_cos/rope_sin: same contract as flash_fwd — q arrives UN-rotated,
    the kernels rotate q blocks at load for the recompute, and the emitted
    dq is already pulled back to un-rotated q space (in-kernel inverse
    rotation at the dq finalize).  K must be pre-rotated by the caller."""
    if q.dtype == jnp.float16:
        # fp16 computes as bf16 (no f16 in Mosaic; see flash_fwd) and the
        # grads cast back to the caller's fp16.
        f16 = lambda x: x.astype(jnp.bfloat16)
        res = flash_bwd(
            f16(q), f16(k), f16(v), f16(out), lse, f16(dout), bias=bias,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_positions=q_positions, kv_positions=kv_positions,
            causal=causal, scale=scale, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, window=window, rope_cos=rope_cos,
            rope_sin=rope_sin, logit_softcap=logit_softcap,
            alibi_slopes=alibi_slopes, want_dbias=want_dbias,
            config=config, interpret=interpret,
        )
        return tuple(g.astype(jnp.float16) for g in res[:3]) + tuple(res[3:])

    if config is None:
        from flash_attn_tpu.utils.autotune import get_bwd_config

        config = get_bwd_config(q.shape[1], k.shape[1], q.shape[3], q.dtype)
    cfg = config
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if want_dbias and bias is None:
        raise ValueError("want_dbias=True requires a bias")

    batch, seqlen_q, num_heads, head_dim = q.shape
    _, seqlen_k, num_heads_k, _ = k.shape
    group = num_heads // num_heads_k
    if scale is None:
        scale = head_dim**-0.5

    block_q = min(cfg.block_q, max(_cdiv(seqlen_q, 8) * 8, 8))
    block_k = min(cfg.block_k, max(_cdiv(seqlen_k, 128) * 128, 128))

    # delta = rowsum(dout*out): the softmax_d preprocess (flash_attn.h:73).
    delta = jnp.einsum(
        "bqhd,bqhd->bhq", dout.astype(jnp.float32), out.astype(jnp.float32)
    )

    qt = _pad_axis(jnp.swapaxes(q, 1, 2), 2, block_q)
    dot = _pad_axis(jnp.swapaxes(dout, 1, 2), 2, block_q)
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 2, block_k)
    # Pad lse with NEG_INF (masked rows) and delta with 0 so pad rows are
    # inert; both ride a trailing length-1 lane dim ([B,H,Sq,1], Mosaic-legal).
    lse_p = jnp.pad(
        lse.astype(jnp.float32),
        ((0, 0), (0, 0), (0, qt.shape[2] - seqlen_q)),
        constant_values=NEG_INF,
    )[..., None]
    delta_p = _pad_axis(delta, 2, block_q)[..., None]

    sq_p, sk_p = qt.shape[2], kt.shape[2]
    num_q_blocks = sq_p // block_q
    num_k_blocks = sk_p // block_k

    has_bias = bias is not None
    has_segs = q_segment_ids is not None

    if has_bias:
        bias_f = jnp.broadcast_to(
            bias.astype(jnp.float32), (batch, num_heads, seqlen_q, seqlen_k)
        )
        bias_f = _pad_axis(_pad_axis(bias_f, 2, block_q), 3, block_k)
    else:
        bias_f = jnp.zeros((1, 1, block_q, block_k), jnp.float32)

    if has_segs:
        qseg = _pad_axis(q_segment_ids.astype(jnp.int32), 1, block_q)[..., None]
        kseg = jnp.pad(
            kv_segment_ids.astype(jnp.int32),
            ((0, 0), (0, sk_p - kv_segment_ids.shape[1])),
            constant_values=-1,
        )[:, None, :]
    else:
        qseg = jnp.zeros((batch, block_q, 1), jnp.int32)
        kseg = jnp.zeros((batch, 1, block_k), jnp.int32)

    has_pos = q_positions is not None
    if has_pos:
        qpos = jnp.pad(
            q_positions.astype(jnp.int32),
            ((0, 0), (0, sq_p - q_positions.shape[1])),
            constant_values=-(2**30),
        )[..., None]
        kpos = jnp.pad(
            kv_positions.astype(jnp.int32),
            ((0, 0), (0, sk_p - kv_positions.shape[1])),
            constant_values=2**30,
        )[:, None, :]
    else:
        qpos = jnp.zeros((batch, block_q, 1), jnp.int32)
        kpos = jnp.zeros((batch, 1, block_k), jnp.int32)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_heads, 1, 1
        )
    else:
        alibi = jnp.zeros((1, 1, 1), jnp.float32)

    has_rope = rope_cos is not None
    if has_rope:
        if rope_sin is None:
            raise ValueError("rope_cos given without rope_sin")
        d2 = head_dim // 2
        rc = jnp.asarray(rope_cos, jnp.float32)
        rs = jnp.asarray(rope_sin, jnp.float32)
        if rc.ndim == 2:
            rc, rs = rc[None], rs[None]
        rc = jnp.broadcast_to(rc, (batch, seqlen_q, d2))
        rs = jnp.broadcast_to(rs, (batch, seqlen_q, d2))
        rope_cs = _pad_axis(jnp.concatenate([rc, rs], axis=-1), 1, block_q)
    else:
        rope_cs = jnp.zeros((1, block_q, head_dim), jnp.float32)

    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    # --- common specs (as functions of the two block-coord names) ---
    shift_c = seqlen_k - seqlen_q

    if causal:
        # Clamp index maps on predicated-off blocks so Pallas sees an
        # unchanged block index and skips the DMA (see flash_fwd).
        def clamp_ki(qi, ki):
            last = (qi * block_q + (block_q - 1) + shift_c) // block_k
            return jnp.minimum(ki, jnp.maximum(last, 0))

        def clamp_qi(qi, ki):
            first = -(-(ki * block_k - shift_c - (block_q - 1)) // block_q)
            return jnp.maximum(qi, jnp.minimum(jnp.maximum(first, 0), num_q_blocks - 1))

    else:
        clamp_ki = lambda qi, ki: ki
        clamp_qi = lambda qi, ki: qi

    def mk_specs(order, *, clamp_k: bool):
        # order maps kernel grid ids -> (qi, ki).  Only the pass's *inner*
        # axis gets clamped (dq pass: ki; dkv pass: qi) — clamping the outer
        # axis would remap constant blocks to varying ones and add DMAs.
        cq = (lambda qi, ki: qi) if clamp_k else clamp_qi
        ck = clamp_ki if clamp_k else (lambda qi, ki: ki)

        def qmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, h, cq(qi, ki), 0)

        def kmap(b, h, x, y, *_, g=group):
            qi, ki = order(x, y)
            return (b, h // g, ck(qi, ki), 0)

        def rowmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, h, cq(qi, ki), 0)

        def biasmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, h, qi, ki) if has_bias else (0, 0, 0, 0)

        def qsegmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, qi, 0) if has_segs else (0, 0, 0)

        def ksegmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, 0, ki) if has_segs else (0, 0, 0)

        def qposmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, qi, 0) if has_pos else (0, 0, 0)

        def kposmap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, 0, ki) if has_pos else (0, 0, 0)

        def ropemap(b, h, x, y, *_):
            qi, ki = order(x, y)
            return (b, cq(qi, ki), 0) if has_rope else (0, 0, 0)

        def alibimap(b, h, x, y, *_):
            return (h, 0, 0) if has_alibi else (0, 0, 0)

        return [
            pl.BlockSpec((1, 1, block_q, head_dim), qmap),      # q
            pl.BlockSpec((1, 1, block_k, head_dim), kmap),      # k
            pl.BlockSpec((1, 1, block_k, head_dim), kmap),      # v
            pl.BlockSpec((1, 1, block_q, head_dim), qmap),      # dout
            pl.BlockSpec((1, 1, block_q, 1), rowmap),           # lse
            pl.BlockSpec((1, 1, block_q, 1), rowmap),           # delta
            pl.BlockSpec((1, 1, block_q, block_k), biasmap),    # bias
            pl.BlockSpec((1, block_q, 1), qsegmap),             # qseg
            pl.BlockSpec((1, 1, block_k), ksegmap),             # kseg
            pl.BlockSpec((1, block_q, 1), qposmap),             # qpos
            pl.BlockSpec((1, 1, block_k), kposmap),             # kpos
            pl.BlockSpec((1, block_q, head_dim), ropemap),      # rope table
            pl.BlockSpec((1, 1, 1), alibimap),                  # alibi slope
        ]

    common_kwargs = dict(
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        block_q=block_q, block_k=block_k,
        causal=causal, window=window, scale=float(scale),
        softcap=None if logit_softcap is None else float(logit_softcap),
        dropout_rate=float(dropout_rate),
        has_bias=has_bias, has_segs=has_segs, has_pos=has_pos,
        has_rope=has_rope, has_alibi=has_alibi,
    )
    args = (seed, qt, kt, vt, dot, lse_p, delta_p, bias_f, qseg, kseg, qpos,
            kpos, rope_cs, alibi)

    gemm_flops = 2 * batch * num_heads * seqlen_q * seqlen_k * head_dim
    if causal:
        gemm_flops //= 2

    # --- dq pass ---
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, num_k_blocks=num_k_blocks, out_dtype=jnp.float32,
            **common_kwargs,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, num_heads, num_q_blocks, num_k_blocks),
            in_specs=mk_specs(lambda x, y: (x, y), clamp_k=True),
            out_specs=pl.BlockSpec(
                (1, 1, block_q, head_dim), lambda b, h, x, y, *_: (b, h, x, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_heads, sq_p, head_dim), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * gemm_flops, bytes_accessed=qt.size * 4 * 4,
            transcendentals=batch * num_heads * seqlen_q * seqlen_k,
        ),
        interpret=interpret,
    )(*args)

    # --- dkv pass (per query head; group-reduced below) ---
    # When dbias is wanted, the pass also emits the raw ds tiles (the score
    # gradient — dbias before broadcast-reduction); each (qi, ki) tile is
    # written exactly once by the (ki, qi) grid.
    want_ds = bool(want_dbias)
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_k, head_dim), lambda b, h, x, y, *_: (b, h, x, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_k, head_dim), lambda b, h, x, y, *_: (b, h, x, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_q, block_k),
            (lambda b, h, x, y, *_: (b, h, y, x))
            if want_ds
            else (lambda b, h, x, y, *_: (0, 0, 0, 0)),
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, num_heads, sk_p, head_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_heads, sk_p, head_dim), jnp.float32),
        jax.ShapeDtypeStruct(
            (batch, num_heads, sq_p, sk_p) if want_ds else (1, 1, block_q, block_k),
            jnp.float32,
        ),
    ]
    dk, dv, ds_full = pl.pallas_call(
        functools.partial(
            _dkv_kernel, num_q_blocks=num_q_blocks, out_dtype=jnp.float32,
            want_ds=want_ds, **common_kwargs,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, num_heads, num_k_blocks, num_q_blocks),
            in_specs=mk_specs(lambda x, y: (y, x), clamp_k=False),
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_k, head_dim), jnp.float32),
                pltpu.VMEM((block_k, head_dim), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * gemm_flops, bytes_accessed=kt.size * 4 * 4,
            transcendentals=batch * num_heads * seqlen_q * seqlen_k,
        ),
        interpret=interpret,
    )(*args)

    dq = jnp.swapaxes(dq[:, :, :seqlen_q], 1, 2).astype(q.dtype)
    dk = jnp.swapaxes(dk[:, :, :seqlen_k], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :seqlen_k], 1, 2)
    if group > 1:
        dk = dk.reshape(batch, seqlen_k, num_heads_k, group, head_dim).sum(3)
        dv = dv.reshape(batch, seqlen_k, num_heads_k, group, head_dim).sum(3)
    dq, dk, dv = dq, dk.astype(k.dtype), dv.astype(v.dtype)
    if not want_dbias:
        return dq, dk, dv
    ds = ds_full[:, :, :seqlen_q, :seqlen_k]
    dbias = _reduce_to_shape(ds, bias.shape).astype(bias.dtype)
    return dq, dk, dv, dbias


def _reduce_to_shape(g, bias_shape):
    """Sum ds [B,H,Sq,Sk] down to the (broadcastable) bias shape."""
    pad = (1,) * (4 - len(bias_shape)) + tuple(bias_shape)
    for axis, (bs, fs) in enumerate(zip(pad, g.shape)):
        if bs == 1 and fs != 1:
            g = g.sum(axis=axis, keepdims=True)
    return g.reshape(bias_shape)
