"""Public flash-attention API — the TPU-native replacement for the reference's
four C entry points (flash_attn.h:10-134).

One dtype-polymorphic, shape-driven *function* with ``jax.custom_vjp`` instead
of four void*-based ABI symbols: dense and varlen collapse into one surface
(varlen = packed tokens + segment ids; ``flash_attention_varlen`` adapts
cu_seqlens at the edge, flash_attn.h:41-42), forward/backward pair through
autodiff instead of caller-managed residual buffers, and errors are Python
exceptions instead of bool + flash_attn_error() (flash_attn.h:136-138).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops import reference
from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd
from flash_attn_tpu.ops.varlen import cu_seqlens_to_segment_ids


def _fwd_config(config, softmax_mode, q, k):
    """Forward-only config override: applies ``softmax_mode`` on top of the
    (heuristic or explicit) FORWARD block config.  Kept separate from the
    ``config`` threaded into the backward so a softmax_mode override never
    smuggles fwd-sized blocks into flash_bwd (whose get_bwd_config holds
    more live tiles and must pick its own shapes)."""
    if softmax_mode is None:
        return config
    if softmax_mode == "clamped_verify":
        # internal mode (returns a 3-tuple); the public surface for it is
        # "auto" (clamped-speed in range, exact online fallback otherwise)
        raise ValueError("use softmax_mode='auto' (clamped_verify is the "
                         "kernel-internal half of it)")
    import dataclasses

    if config is None:
        from flash_attn_tpu.utils.autotune import get_config

        config = get_config(q.shape[1], k.shape[1], q.shape[3], q.dtype)
    return dataclasses.replace(config, softmax_mode=softmax_mode)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15)
)
def _flash_attention_core(
    q,
    k,
    v,
    bias,
    segs,  # (q_segment_ids, kv_segment_ids, q_positions, kv_positions) or None
    rope,  # (rope_cos, rope_sin) or None — in-kernel q-side rotation
    alibi,  # [H] slopes or None — in-kernel ALiBi bias
    dropout_seed,  # int32 scalar array — an OPERAND so distributed wrappers
    # (ring/ulysses) can pass traced per-step/per-shard seeds and still get
    # the exact bwd replay (flash_attn.h:33-34 seed/offset, traced form)
    causal: bool,
    scale: Optional[float],
    dropout_rate: float,
    window,
    logit_softcap,
    config,
    softmax_mode,
    interpret,
):
    config = _fwd_config(config, softmax_mode, q, k)
    out, _ = flash_fwd(
        q,
        k,
        v,
        bias=bias,
        q_segment_ids=None if segs is None else segs[0],
        kv_segment_ids=None if segs is None else segs[1],
        q_positions=None if segs is None else segs[2],
        kv_positions=None if segs is None else segs[3],
        causal=causal,
        scale=scale,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        window=window,
        rope_cos=None if rope is None else rope[0],
        rope_sin=None if rope is None else rope[1],
        logit_softcap=logit_softcap,
        alibi_slopes=alibi,
        config=config,
        interpret=interpret,
    )
    return out


def _core_fwd(q, k, v, bias, segs, rope, alibi, dropout_seed, causal, scale,
              dropout_rate, window, logit_softcap, config, softmax_mode,
              interpret):
    out, lse = flash_fwd(
        q, k, v,
        config=_fwd_config(config, softmax_mode, q, k),
        bias=bias,
        q_segment_ids=None if segs is None else segs[0],
        kv_segment_ids=None if segs is None else segs[1],
        q_positions=None if segs is None else segs[2],
        kv_positions=None if segs is None else segs[3],
        causal=causal, scale=scale,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        window=window,
        rope_cos=None if rope is None else rope[0],
        rope_sin=None if rope is None else rope[1],
        logit_softcap=logit_softcap,
        alibi_slopes=alibi,
        interpret=interpret,
    )
    # Residuals ≙ what the reference saves for flash_attn_bwd: q,k,v,out,lse
    # (flash_attn.h:68-74); the LSE replaces the caller-allocated
    # softmax_lse workspace.  The seed rides the residuals so the backward
    # replays the identical dropout mask (flash_attn.h:96-97).
    return out, (q, k, v, bias, segs, rope, alibi, dropout_seed, out, lse)


def _core_bwd(causal, scale, dropout_rate, window,
              logit_softcap, config, softmax_mode, interpret, res, dout):
    # softmax_mode shaped only the forward (see _fwd_config); the backward
    # keeps ``config`` as the caller passed it (usually None) so flash_bwd
    # resolves its own get_bwd_config block shapes.
    del softmax_mode
    q, k, v, bias, segs, rope, alibi, dropout_seed, out, lse = res
    if _use_jnp_bwd() and dropout_rate == 0.0:
        # Debug-only O(S^2) reference backward (FATPU_JNP_BWD=1).  out was
        # produced from R(q), so rotate q here and pull dq back after.
        from flash_attn_tpu.ops.rope import rope_rotate, rope_unrotate

        q_for_bwd = (
            rope_rotate(q, rope[0], rope[1]) if rope is not None else q
        )
        dq, dk, dv, dbias = _jnp_backward(
            q_for_bwd, k, v, out, lse, dout, bias=bias, segs=segs,
            causal=causal,
            scale=scale, window=window, logit_softcap=logit_softcap,
            alibi_slopes=alibi,
            want_dbias=bias is not None,
        )
        if rope is not None:
            dq = rope_unrotate(dq, rope[0], rope[1])
    else:
        from flash_attn_tpu.ops.flash_bwd import flash_bwd

        # In-kernel rope (same contract as the forward): q goes in
        # un-rotated, the kernels rotate at block load, and dq comes back
        # already in un-rotated q space — no R(q)/R^-1(dq) materialization.
        grads = flash_bwd(
            q, k, v, out, lse, dout,
            bias=bias,
            q_segment_ids=None if segs is None else segs[0],
            kv_segment_ids=None if segs is None else segs[1],
            q_positions=None if segs is None else segs[2],
            kv_positions=None if segs is None else segs[3],
            causal=causal, scale=scale,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            window=window,
            rope_cos=None if rope is None else rope[0],
            rope_sin=None if rope is None else rope[1],
            logit_softcap=logit_softcap,
            alibi_slopes=alibi,
            want_dbias=bias is not None,
            config=config, interpret=interpret,
        )
        if bias is None:
            dq, dk, dv = grads
            dbias = None
        else:
            dq, dk, dv, dbias = grads
    drope = None
    if rope is not None:
        drope = (jnp.zeros_like(rope[0]), jnp.zeros_like(rope[1]))
    dalibi = None if alibi is None else jnp.zeros_like(alibi)
    import numpy as np

    dseed = np.zeros(jnp.shape(dropout_seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, dbias, _int_cotangent(segs), drope, dalibi, dseed


def _use_jnp_bwd() -> bool:
    import os

    return os.environ.get("FATPU_JNP_BWD", "0") == "1"


def _int_cotangent(segs):
    """float0 cotangents for the integer segment-id arrays."""
    if segs is None:
        return None
    import numpy as np

    return tuple(
        None if s is None else np.zeros(s.shape, dtype=jax.dtypes.float0)
        for s in segs
    )


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def _jnp_backward(q, k, v, out, lse, dout, *, bias, segs, causal, scale,
                  window, want_dbias, logit_softcap=None,
                  alibi_slopes=None):
    """FA2 backward math from LSE residuals, in pure jnp (O(S^2) memory;
    the Pallas backward kernel supersedes this on the hot path).

    Mirrors the recompute structure of flash_attn_bwd (flash_attn.h:68-99):
    P = exp(S - lse); dv = P^T dout; dp = dout V^T;
    D = rowsum(dout * out) (the softmax_d workspace, flash_attn.h:73);
    ds = P * (dp - D); dq = ds K * scale; dk = ds^T Q * scale.
    """
    batch, seqlen_q, num_heads, head_dim = q.shape
    seqlen_k = k.shape[1]
    num_heads_k = k.shape[2]
    if scale is None:
        scale = head_dim**-0.5
    group = num_heads // num_heads_k

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=2)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=2)
    doutf = dout.astype(jnp.float32)
    outf = out.astype(jnp.float32)

    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    if logit_softcap is not None:
        s_tanh = jnp.tanh(s / logit_softcap)
        s = logit_softcap * s_tanh
    if alibi_slopes is not None:
        i = jnp.arange(seqlen_q)[:, None] + (seqlen_k - seqlen_q)
        j = jnp.arange(seqlen_k)[None, :]
        sl = jnp.asarray(alibi_slopes, jnp.float32)
        s = s - sl[None, :, None, None] * jnp.abs(i - j)[None, None]
    b = reference.attention_bias(
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, causal=causal,
        mask=bias,
        q_segment_ids=None if segs is None else segs[0],
        kv_segment_ids=None if segs is None else segs[1],
        window=window,
    )
    if b is not None:
        s = s + b
    if segs is not None and segs[2] is not None:
        qp, kp = segs[2], segs[3]
        allowed = kp[:, None, None, :] <= qp[:, None, :, None]
        s = jnp.where(allowed, s, float("-inf"))
    lse_b = lse[:, :, :, None]  # [B,H,Sq,1]
    p = jnp.where(jnp.isfinite(s) & jnp.isfinite(lse_b), jnp.exp(s - lse_b), 0.0)

    dv = jnp.einsum("bhqk,bqhd->bkhd", p, doutf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", doutf, vf)
    delta = jnp.sum(doutf * outf, axis=-1)  # [B,Sq,H]  ≙ softmax_d
    ds = p * (dp - jnp.transpose(delta, (0, 2, 1))[:, :, :, None])
    ds_qk = ds
    if logit_softcap is not None:
        ds_qk = ds * (1.0 - s_tanh * s_tanh)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds_qk, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds_qk, qf) * scale

    # GQA: fold gradients of broadcast heads back onto the shared KV heads.
    if group > 1:
        dk = dk.reshape(batch, seqlen_k, num_heads_k, group, head_dim).sum(3)
        dv = dv.reshape(batch, seqlen_k, num_heads_k, group, head_dim).sum(3)

    dbias = None
    if want_dbias:
        dbias = _reduce_bias_grad(ds, bias.shape).astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


def _reduce_bias_grad(ds, bias_shape):
    """Sum ds [B,H,Sq,Sk] down to the (broadcastable) bias shape."""
    g = ds
    full = g.shape
    pad = (1,) * (4 - len(bias_shape)) + tuple(bias_shape)
    for axis, (bs, fs) in enumerate(zip(pad, full)):
        if bs == 1 and fs != 1:
            g = g.sum(axis=axis, keepdims=True)
    return g.reshape(bias_shape)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    mask: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    window: tuple[int, int] | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    logit_softcap: float | None = None,
    alibi_slopes: jax.Array | None = None,
    return_lse: bool = False,
    return_softmax: bool = False,
    config: FlashConfig | None = None,
    softmax_mode: str | None = None,
    interpret: bool | None = None,
):
    """FlashAttention-2. See flash_fwd for shapes; differentiable via
    jax.grad. Replaces flash_attn_fwd/bwd (flash_attn.h:10-36,68-99).

    softmax_mode: overrides just the softmax statistics mode on top of the
    (heuristic or explicit) block config — "clamped" drops the running max
    (measured 0.74 vs 0.61 of MXU peak at the 8B prefill shape; exact for
    natural-units logits in (-87, 55], see FlashConfig.softmax_mode).
    Model inference prefill paths pass "clamped"; the default (None) keeps
    the config's mode — "online" — which is safe for arbitrary scores.

    q_positions/kv_positions: optional int32 position arrays enforcing
    kv_pos <= q_pos (per-sequence causal for packed batches).

    rope_cos/rope_sin ([B,Sq,D/2] fp32): rotate q (rotate-half RoPE)
    inside the forward kernel — pass un-rotated q, pre-rotated k.
    Differentiable (dq is pulled back through the rotation).

    logit_softcap: Gemma-2-style score capping cap*tanh(s/cap) on the
    scaled scores (before bias/mask); differentiable.

    alibi_slopes ([H] fp32): in-kernel ALiBi bias
    -slope_h * |i + Sk - Sq - j| (ops/alibi.alibi_slopes for the standard
    schedule); differentiable w.r.t. q/k/v (slopes are constants).

    return_softmax: also materialize the post-dropout probability matrix
    through the kernel (softmax_ptr debug hook, flash_attn.h:15,30);
    returns (out, lse, probs) and is fwd-only (not differentiable)."""
    _validate(q, k, v, mask)
    segs = None
    if q_segment_ids is not None or q_positions is not None:
        segs = (q_segment_ids, kv_segment_ids, q_positions, kv_positions)
    rope = None
    if rope_cos is not None:
        rope = (rope_cos, rope_sin)
    alibi = (
        None if alibi_slopes is None
        else jnp.asarray(alibi_slopes, jnp.float32)
    )
    if return_softmax:
        return flash_fwd(
            q, k, v, bias=mask,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_positions=q_positions, kv_positions=kv_positions,
            causal=causal, scale=scale, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, window=window,
            rope_cos=rope_cos, rope_sin=rope_sin,
            logit_softcap=logit_softcap, alibi_slopes=alibi,
            config=_fwd_config(config, softmax_mode, q, k),
            interpret=interpret, return_softmax=True,
        )
    if return_lse:
        out, lse = flash_fwd(
            q, k, v, bias=mask,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_positions=q_positions, kv_positions=kv_positions,
            causal=causal, scale=scale, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, window=window,
            rope_cos=rope_cos, rope_sin=rope_sin,
            logit_softcap=logit_softcap, alibi_slopes=alibi,
            config=_fwd_config(config, softmax_mode, q, k),
            interpret=interpret,
        )
        return out, lse
    return _flash_attention_core(
        q, k, v, mask, segs, rope, alibi,
        jnp.asarray(dropout_seed, jnp.int32),
        causal, scale, float(dropout_rate),
        window,
        None if logit_softcap is None else float(logit_softcap),
        config, softmax_mode, interpret,
    )


def flash_attention_varlen(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    *,
    causal: bool = False,
    mask: jax.Array | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    return_lse: bool = False,
    return_softmax: bool = False,
    config: FlashConfig | None = None,
    softmax_mode: str | None = None,
    interpret: bool | None = None,
):
    """Varlen (packed ragged batch) flash attention ≙ flash_attn_varlen_fwd
    (flash_attn.h:38-66).

    q: [total_q, H, D]; k, v: [total_k, Hk, D]; cu_seqlens_*: [b+1] int32
    prefix sums (flash_attn.h:41-42).  Converted at this edge to segment ids
    over a singleton batch; causal masking is per-sequence (each packed
    sequence is causal within itself).

    mask: optional additive attention bias over the PACKED token axes —
    [total_q, total_k], or broadcastable with a leading head axis
    [H, total_q, total_k] (≙ the reference varlen fwd's attn_mask + mask_dims,
    flash_attn.h:65-66; its `const void*` mask_dims there is a typo for
    int64 dims, see SURVEY.md §2.1).  Cross-sequence entries are dead: the
    segment-id mask wins regardless of the bias value.

    return_softmax: also materialize the post-dropout probability matrix
    (softmax_ptr debug hook, flash_attn.h:45,59); returns (out, lse, probs)
    with probs [H, total_q, total_k]; fwd-only (not differentiable).
    """
    if q.ndim != 3:
        raise ValueError(f"varlen q must be [total_q, H, D], got {q.shape}")
    qseg, kseg, qpos_arg, kpos_arg, causal = varlen_segments(
        cu_seqlens_q, cu_seqlens_k, q.shape[0], k.shape[0], causal
    )

    mask_arg = None
    if mask is not None:
        if mask.ndim == 2:
            mask_arg = mask[None, None]  # [1, 1, total_q, total_k]
        elif mask.ndim == 3:
            mask_arg = mask[None]  # [1, H, total_q, total_k]
        else:
            raise ValueError(
                "varlen mask must be [total_q, total_k] or "
                f"[H, total_q, total_k], got {mask.shape}"
            )

    out = flash_attention(
        q[None], k[None], v[None],
        causal=causal, mask=mask_arg,
        q_segment_ids=qseg, kv_segment_ids=kseg,
        q_positions=qpos_arg, kv_positions=kpos_arg,
        scale=scale, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        return_lse=return_lse, return_softmax=return_softmax,
        config=config, softmax_mode=softmax_mode, interpret=interpret,
    )
    if return_softmax:
        out_, lse, probs = out
        return out_[0], lse[0], probs[0]
    if return_lse:
        return out[0][0], out[1][0]
    return out[0]


def varlen_segments(cu_seqlens_q, cu_seqlens_k, total_q: int, total_k: int,
                    causal: bool):
    """cu_seqlens (flash_attn.h:41-42 format) -> kernel-side segment arrays:
    ``(q_segment_ids, kv_segment_ids, q_positions, kv_positions, causal)``,
    each [1, total] (singleton batch) or None.

    Per-sequence causal on a packed batch: global bottom-right alignment is
    wrong; encode the per-sequence alignment into position arrays compared
    inside the kernel (kv_pos <= q_pos) — no O(S^2) bias tensor.  When that
    happens the returned ``causal`` is False (positions carry the mask).
    Shared by flash_attention_varlen and the C-shim varlen executors
    (runtime/abi.py) so both paths mask identically."""
    qseg = cu_seqlens_to_segment_ids(cu_seqlens_q, total_q)[None]
    kseg = cu_seqlens_to_segment_ids(cu_seqlens_k, total_k)[None]
    qpos_arg = kpos_arg = None
    if causal:
        from flash_attn_tpu.ops.varlen import segment_ids_to_positions

        qpos = segment_ids_to_positions(qseg[0])
        kpos = segment_ids_to_positions(kseg[0])
        # per-Q-token lengths of its own q- and k-sequences, for the
        # bottom-right alignment shift within each sequence pair
        qlen = _segment_lengths(cu_seqlens_q, qseg[0])
        klen_for_q = _segment_lengths(cu_seqlens_k, qseg[0])
        qpos_arg = (qpos + (klen_for_q - qlen))[None]
        kpos_arg = kpos[None]
        causal = False
    return qseg, kseg, qpos_arg, kpos_arg, causal


def _segment_lengths(cu_seqlens, segment_ids):
    """Per-token length of its own segment (id 0 padding -> length 0)."""
    lens = jnp.diff(cu_seqlens.astype(jnp.int32))
    lens = jnp.concatenate([jnp.zeros((1,), jnp.int32), lens])  # id->len, id0=pad
    return lens[jnp.clip(segment_ids, 0, lens.shape[0] - 1)]


def _validate(q, k, v, mask):
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be rank-4 [B,S,H,D]; got {q.shape}, {k.shape}, {v.shape}"
        )
    if k.shape != v.shape:
        raise ValueError(f"k and v shapes differ: {k.shape} vs {v.shape}")
    if q.shape[0] != k.shape[0] or q.shape[3] != k.shape[3]:
        raise ValueError(f"q/k mismatch: {q.shape} vs {k.shape}")
    if q.shape[2] % k.shape[2]:
        raise ValueError(
            f"num_heads {q.shape[2]} not a multiple of num_heads_k {k.shape[2]}"
        )
