"""Pallas FlashAttention-2 forward kernel (TPU).

Implements the semantics of the reference's ``flash_attn_fwd`` /
``flash_attn_varlen_fwd`` (flash_attn.h:10-66) as a single online-softmax
block pipeline:

- grid (batch, q_head, q_block, k_block); the k_block axis is innermost so
  fp32 running max / sum / accumulator live in VMEM scratch across grid steps
  (the Pallas grid pipeline double-buffers the K/V block DMAs for us),
- GQA/MQA via the K/V BlockSpec index map (num_heads vs num_heads_k,
  flash_attn.h:22-23) — no materialised head broadcast,
- causal = bottom-right-aligned mask with *static* whole-block skip on the
  strictly-upper blocks (flash_attn.h:29),
- segment ids (varlen packing ≙ cu_seqlens, flash_attn.h:41-42) and an
  arbitrary additive bias (attn_mask, flash_attn.h:35-36) composable with
  causal,
- reproducible counter-based dropout: per-(b,h,qi,ki) seeding of the TPU PRNG
  from a user seed ≙ Philox seed/offset (flash_attn.h:33-34); backward replays
  the identical mask from the same seed,
- LSE residual output in ``b x h x seqlen_q`` layout (flash_attn.h:16,74).

Unlike the reference ABI there are no *_rounded dims (flash_attn.h:20-21,25):
padding to block multiples happens here, inside the wrapper, and is masked in
the kernel.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large-negative instead of -inf inside kernels (avoids NaNs)
# Clamped-softmax score ceiling, base-2 units (FlashConfig.softmax_mode):
# p <= 2^80, so l < 2^93 at 8k context and p·v accumulation stays far from
# the fp32 ceiling; natural-units logits up to 80/log2(e) = 55 pass through
# unclamped.
CLAMP2 = 80.0
# clamped_verify validity window floor (base-2): rows whose running max is
# below this could lose mass to absolute underflow that online softmax's
# max-subtract would have kept; the auto mode falls back to online then.
VERIFY_FLOOR2 = -80.0

LANES = 128


@dataclass(frozen=True)
class FlashConfig:
    """Kernel block configuration (the TPU analog of the reference's tile
    geometry that leaked into its ABI as *_rounded args)."""

    block_q: int = 128
    block_k: int = 128
    # Upper bound for VMEM the compiler may use; None = let Mosaic decide.
    vmem_limit_bytes: int | None = None
    # Base-2 softmax: fold log2(e) into the q pre-scale and use the VPU's
    # native 2^x for p/alpha (the FA2 trick); lse converts back at finalize.
    # Default ON: the r3 honest-estimator sweep measured 124.2 vs 111.3
    # TF/s (0.630 vs 0.565 of peak) at the 8B prefill shape with identical
    # oracle error (benchmarks/r3_fwd_softmax_sweep2.py; the round-2
    # "neutral" reading came from the jitterier session).
    exp2: bool = True
    # Causal-only: route fully-live (below-diagonal) blocks through a
    # maskless body via top-level pl.when, so the [bq, bk] compare+select
    # runs only on diagonal-straddling blocks.  (An *inner* lax.cond around
    # just the mask was a net loss — predicating the whole body is not.)
    split_causal_mask: bool = True
    # Causal-only: flatten the (q_block, k_block) grid plane to the live
    # lower-triangular pairs via scalar-prefetch index maps, so dead
    # above-diagonal steps don't exist at all (vs predicated-off bodies
    # that still pay grid bookkeeping).
    # NOTE(negative result): measured SLOWER than the predicated
    # rectangular grid at the 8B prefill shape — 110.2 TF/s vs 122.4 TF/s
    # at 1024x1024 blocks (and worse at every other block shape tried).
    # Flattening collapses the parallel q-block dim into one "arbitrary"
    # sequential dim, which costs Mosaic more cross-step pipelining than
    # the dead-step bookkeeping it saves (dead steps already skip their
    # DMAs via the clamped index maps).  Kept as an option because it is
    # bitwise-identical and cheap to maintain; default off.
    triangular: bool = False
    # Softmax compute dtype: "f32" (default) or "bf16".  The forward's gap
    # to peak is softmax VPU passes, not MXU (probe: stats-free kernel hits
    # 0.92 of peak vs 0.61 for the f32-softmax baseline at the 8B prefill
    # shape); running mask/max/exp/sum on bf16 halves those passes.  bf16
    # exp adds ~|s|*2^-9 argument rounding (p relative error ~1%, which
    # mostly cancels in the p·V / l ratio); running m/l stats stay f32.
    # Opt-in: inference prefill is the intended user; keep f32 for
    # training (bwd recomputes p from lse in f32 — mixed precisions
    # between fwd residuals and bwd recompute add avoidable grad noise).
    softmax_dtype: str = "f32"
    # Softmax statistics mode: "online" (default; FA2 running max/rescale)
    # or "clamped" (no running max at all: p = 2^min(s, 80) in base-2 score
    # units, accumulate raw, normalize by l at finalize).  Drops the
    # [bq, bk] max-reduce pass, the per-element m-subtract (a clamp min
    # replaces it), the alpha accumulator rescale, and the m scratch
    # traffic — the probe-measured stats cost is ~0.3 of peak at the 8B
    # prefill shape.  EXACT (same fp error class as online) whenever no
    # score reaches the clamp: p/l is scale-free, and fp32 spans the
    # un-subtracted range (2^min(s) .. 2^80, sums < 2^98 for |v|<2^5).
    # Contract: base-2 scores must lie in (-126, 80] — natural-units
    # logits in (-87, 55] — i.e. any sane model; scores above 80 clamp
    # (graceful, tie toward uniform), rows with all scores < -126
    # underflow to an invalid row (out=0, lse=-inf).  Use f32
    # softmax_dtype with this mode: bf16's 8-bit mantissa on
    # *unsubtracted* arguments costs |s|*2^-9 relative error on p.
    # Two more modes (r4): "clamped_verify" = clamped + per-row range
    # tracking; returns (out, lse, valid) where valid==1 iff the row's
    # scores stayed inside (VERIFY_FLOOR2, CLAMP2] base-2 (clamped ==
    # online exactly there).  "auto" = clamped_verify with a lax.cond
    # fallback to the online kernel when any row left the window — exact
    # for arbitrary logits, clamped-speed for in-range ones.
    softmax_mode: str = "online"
    # NOTE(negative result): a one-k-step software pipeline (stage s=QK and
    # V into VMEM scratch, run softmax+PV of the previous step) was measured
    # at 110.8 TF/s vs 115.2 TF/s for the plain grid at the 8B prefill
    # shape — the extra scratch traffic costs more than the VPU/MXU overlap
    # saves (Mosaic already overlaps across grid steps via its own double
    # buffering).  Removed; don't re-add without new data.


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def sdot(a, b, dims=(((1,), (1,)), ((), ()))):
    """MXU dot with fp32 accumulation.

    bf16/fp16 operands feed the MXU natively (single pass); fp32 operands get
    HIGHEST precision (multi-pass) so fp32 attention matches the fp32 oracle.
    Default dims contract the last axis of both (q @ k^T shape).
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=prec
    )


def rope_rotate_block(x, cs, inverse: bool = False):
    """Rotate-half RoPE on one [rows, D] block inside a kernel.

    cs: [rows, D] fp32 table, cos in lanes [:D/2], sin in lanes [D/2:].
    inverse=True applies R(-angle) (the rotation is orthogonal) — used by
    the backward's dq finalize to pull dq back to un-rotated q space."""
    d2 = cs.shape[1] // 2
    c, sn = cs[:, :d2], cs[:, d2:]
    if inverse:
        sn = -sn
    xf = x.astype(jnp.float32)
    x1, x2 = xf[:, :d2], xf[:, d2:]
    return jnp.concatenate(
        [x1 * c - x2 * sn, x2 * c + x1 * sn], axis=1
    ).astype(x.dtype)


def _pad_axis(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    padded = _cdiv(size, multiple) * multiple
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads)


def _mix_seed(seed_ref, b, h):
    """Deterministic per-(batch, head) PRNG seed from the user seed —
    counter-based like Philox seed/offset (flash_attn.h:33-34), so the
    backward pass can replay the identical dropout mask."""
    import numpy as np

    s = seed_ref[0]
    # Cheap integer hash; all operands int32 (SMEM scalars).  Constants are
    # the usual avalanche multipliers, wrapped into int32 range.
    c1, c2 = (
        np.uint32(c).astype(np.int32) for c in (0x9E3779B1, 0x85EBCA77)
    )
    x = s ^ (b * c1)
    x = x ^ (h * c2)
    return x


def dropout_keep_mask(seed_ref, b, h, row0, col0, block_q, block_k, rate):
    """Counter-based dropout keep-mask, [block_q, block_k] bool.

    A murmur3-style integer finalizer over (seed, batch, head, *absolute*
    element coords) — pure int32 VPU ops, so it runs identically under Mosaic
    and interpret mode.  Keying on absolute (row, col) rather than block
    indices makes the mask independent of the kernel's block configuration,
    so forward and backward replay identically even when they tile the
    sequence differently (the TPU-native form of the Philox seed/offset
    contract, flash_attn.h:33-34, 96-97).
    """
    import numpy as np

    mix = _mix_seed(seed_ref, b, h)
    row = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    m1 = np.uint32(0x9E3779B9).astype(np.int32)
    m2 = np.uint32(0x7FEB352D).astype(np.int32)
    f1 = np.uint32(0x85EBCA6B).astype(np.int32)
    f2 = np.uint32(0xC2B2AE35).astype(np.int32)
    x = mix + row * m1 + col * m2
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * f1
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * f2
    x = x ^ jax.lax.shift_right_logical(x, 16)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return bits >= threshold


def _fwd_kernel(
    # scalar prefetch
    seed_ref,
    tri_ref,  # [3, L] int32 (qi, ki, is_last) when flattened; [3, 1] dummy
    # inputs
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    qseg_ref,
    kseg_ref,
    qpos_ref,
    kpos_ref,
    rope_ref,
    alibi_ref,  # [1, 1, 1] per-head slope (or dummy)
    # outputs (+ optional probs outputs), then scratch
    out_ref,
    lse_ref,
    *rest,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    causal: bool,
    window: tuple | None,
    dropout_rate: float,
    has_bias: bool,
    has_segs: bool,
    has_pos: bool,
    has_rope: bool,
    has_alibi: bool,
    softcap: float | None,
    use_exp2: bool,
    clamped: bool,
    verify: bool,
    split_causal_mask: bool,
    flattened: bool,
    soft_bf16: bool,
    return_probs: bool,
    out_dtype,
):
    if return_probs:
        # kernel-path return_softmax (flash_attn.h:15,30): praw holds the
        # per-step unnormalized exp(s - m_running); mblk holds that step's
        # running max (natural-log units) so the wrapper can renormalize to
        # true post-dropout probabilities via P = praw * exp(mblk - lse).
        praw_ref, mblk_ref = rest[0], rest[1]
        m_scratch, l_scratch, acc_scratch = rest[2:]
    elif verify:
        vstat_ref = rest[0]
        m_scratch, l_scratch, acc_scratch = rest[1:]
    else:
        m_scratch, l_scratch, acc_scratch = rest
    if flattened:
        # Triangular grid: (b, h, l) where l walks only the live causal
        # (qi, ki) pairs, qi-major; block coords come from scalar prefetch.
        b, h, l = (pl.program_id(i) for i in range(3))
        qi = tri_ref[0, l]
        ki = tri_ref[1, l]
        is_last_k = tri_ref[2, l] == 1
    else:
        b, h, qi, ki = (pl.program_id(i) for i in range(4))
        is_last_k = ki == num_k_blocks - 1

    @pl.when(ki == 0)
    def _init():
        if not clamped or verify:  # m unused only in plain clamped mode
            m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Bottom-right-aligned causal: q row i sees k col j iff j <= i + shift.
    shift = seqlen_k - seqlen_q

    def _apply_mask(s, with_causal):
        """Set masked score entries to NEG_INF.  Fully-masked *rows* need no
        special handling here: their running max stays exactly NEG_INF and
        the finalize step gates on that (exp(s - m) garbage is discarded).

        Built from [bq,1] / [1,bk] 1-D components so the full-lattice VPU
        work is one broadcasted compare (+ one select) per mask kind — not
        two 2-D iotas plus adds (measured: the 2-D form held the causal
        kernel ~20% under its ceiling at the 8B prefill shape).  Pad columns
        fold into the causal compare by pushing their column id to +inf."""
        row1 = qi * block_q + shift + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )  # [bq, 1] (pre-shifted)
        col1 = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )  # [1, bk]
        pad_cols = seqlen_k % block_k != 0
        if pad_cols:
            col1 = jnp.where(col1 < seqlen_k, col1, jnp.int32(2**30))
        mask = None
        if with_causal:
            mask = col1 <= row1  # broadcast compare; pad cols auto-fail
        elif pad_cols:
            mask = jnp.broadcast_to(col1 < 2**30, (block_q, block_k))
        if window is not None:
            # local attention (left, right), bottom-right aligned; -1 = open.
            # With explicit positions the window compares THEM instead of
            # local block coords — this is what lets sliding windows compose
            # with ring-attention shards (global positions) and packed varlen
            # batches (per-sequence positions).
            left, right = window
            wrow, wcol = (
                (qpos_ref[0], kpos_ref[0]) if has_pos else (row1, col1)
            )
            if left >= 0:
                m = wcol >= wrow - left
                mask = m if mask is None else mask & m
            if right >= 0:
                m = wcol <= wrow + right
                mask = m if mask is None else mask & m
        if has_segs:
            m = qseg_ref[0] == kseg_ref[0]  # (bq,1) == (1,bk)
            mask = m if mask is None else mask & m
        if has_pos:
            # per-sequence causal for packed varlen batches: caller encodes
            # the bottom-right alignment into q_positions (flash_attn.h:38-66
            # varlen causal semantics, in-kernel, no O(S^2) bias tensor).
            m = kpos_ref[0] <= qpos_ref[0]
            mask = m if mask is None else mask & m
        if mask is None:
            return s
        return jnp.where(mask, s, NEG_INF)

    def _body(with_causal=causal):
        # Native-dtype operands straight into the MXU (bf16 x bf16 -> fp32);
        # softmax scale is pre-folded into q by the wrapper.
        qb = q_ref[0, 0]  # [bq, d]
        if has_rope:
            # In-kernel q-side RoPE (rotate-half): saves the [B,S,H,D] HBM
            # round trip of materializing rotated q outside.  The rope table
            # rides a [bq, d] block (cos | sin halves) keyed by qi only, so
            # its DMA re-fires only when qi changes; the [bq, d] VPU rotate
            # per step is ~2/bq of the step's MXU work — noise at bq >= 128.
            # (Scale pre-fold commutes: R(c*q) = c*R(q).)
            qb = rope_rotate_block(qb, rope_ref[0])
        s = sdot(qb, k_ref[0, 0])  # [bq, bk] fp32

        if softcap is not None:
            # Gemma-2-style logit softcapping: cap * tanh(s / cap) on the
            # scaled scores, before bias/mask.  In base-2 modes s carries a
            # LOG2E factor, so the wrapper pre-scales the cap to match.
            s = softcap * jnp.tanh(s / softcap)

        if has_bias:
            # clamp so user -inf bias entries become finite NEG_INF (keeps
            # the fully-masked-row algebra NaN-free)
            s = jnp.maximum(s + bias_ref[0, 0].astype(jnp.float32), NEG_INF)

        if has_alibi:
            # ALiBi: s -= slope_h * |i + shift - j| (upstream flash-attn
            # alibi_slopes semantic, causal and non-causal).  Applied in
            # _body (not _apply_mask) so the maskless causal fast path
            # keeps the bias; the slope arrives as a [1,1,1] per-head
            # block (4-byte DMA per head change).
            rowa = (
                qi * block_q + shift
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            )
            cola = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            dist = jnp.abs(rowa - cola).astype(s.dtype)
            s = s - alibi_ref[0, 0, 0].astype(s.dtype) * dist

        if soft_bf16:
            # softmax in bf16: one cast here, then every [bq, bk]-wide VPU
            # pass below (mask select, max, exp, sum read, p_v select) runs
            # at half register width.  bf16 spans f32's exponent range, so
            # NEG_INF masking algebra is unchanged.
            s = s.astype(jnp.bfloat16)

        if (has_segs or has_pos or with_causal or window is not None
                or seqlen_k % block_k != 0):
            # NOTE: a per-block *inner* lax.cond skipping just the mask on
            # fully-live causal blocks is a net LOSS on Mosaic (85 vs
            # 112 TF/s at the 8B prefill shape); cheap 1-D-component masks
            # always, plus optional whole-body splitting (split_causal_mask)
            # at the pl.when level below.
            s = _apply_mask(s, with_causal)

        l_prev = l_scratch[:, :1]
        if clamped:
            # No running max (FlashConfig.softmax_mode="clamped"): scores
            # arrive in base-2 units, a clamp min replaces the m-subtract,
            # and the accumulator needs no alpha rescale.  Masked NEG_INF
            # entries exp2 to exactly 0.
            p = jax.lax.exp2(jnp.minimum(s, s.dtype.type(CLAMP2)))
            l_new = l_prev + jnp.sum(
                p, axis=1, keepdims=True
            ).astype(jnp.float32)
            l_scratch[:, :1] = l_new
            if verify:
                # range tracking only: the max feeds no subtract and no
                # accumulator rescale — just the finalize validity check
                m_cur = jnp.max(s, axis=1, keepdims=True).astype(jnp.float32)
                m_scratch[:, :1] = jnp.maximum(m_scratch[:, :1], m_cur)
            alpha = None
            m_new = None
        else:
            m_prev = m_scratch[:, :1]  # [bq, 1]
            m_cur = jnp.max(s, axis=1, keepdims=True).astype(jnp.float32)
            m_new = jnp.maximum(m_prev, m_cur)  # [bq, 1] f32 running stats
            m_sub = m_new.astype(s.dtype)
            if use_exp2:
                # s is in base-2 units (log2(e) folded into the q pre-scale
                # by the wrapper); 2^x is the VPU-native transcendental.
                alpha = jax.lax.exp2(m_prev - m_new)  # [bq, 1]
                p = jax.lax.exp2(s - m_sub)  # [bq, bk], s.dtype
            else:
                alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
                p = jnp.exp(s - m_sub)  # [bq, bk], s.dtype
            # bf16 path: reduce in bf16 and upcast the [bq,1] result — a
            # dtype=f32 sum lowers to a full-width bf16->f32 convert pass
            # that erases the savings (measured: 104.9 vs 113.6 TF/s, WORSE
            # than f32 softmax); the bf16 tree-reduce costs ~log2(bk)
            # roundings on l (~0.4%), which the accuracy gate below the
            # oracle confirms is inside FA2-style tolerance.
            l_blk = jnp.sum(p, axis=1, keepdims=True).astype(jnp.float32)
            l_new = l_prev * alpha + l_blk

            # Narrow [bq, 1] stat writes: broadcasting to the full 128-lane
            # scratch costs two 128-wide f32 store passes per step.
            m_scratch[:, :1] = m_new
            l_scratch[:, :1] = l_new

        if dropout_rate > 0.0:
            keep = dropout_keep_mask(
                seed_ref, b, h, qi * block_q, ki * block_k,
                block_q, block_k, dropout_rate,
            )
            p_v = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_v = p

        if return_probs:
            praw_ref[0, 0] = p_v.astype(jnp.float32)
            if clamped:
                # praw is already e^{s_nat}; P = praw * exp(0 - lse).
                m_out = jnp.zeros((block_q, 1), jnp.float32)
            else:
                m_out = m_new * 0.6931471805599453 if use_exp2 else m_new
            mblk_ref[0, 0, 0] = m_out.astype(jnp.float32)

        v = v_ref[0, 0]  # [bk, d]
        pv = sdot(p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())))  # [bq, d]
        if clamped:
            acc_scratch[...] = acc_scratch[...] + pv
        else:
            acc_scratch[...] = acc_scratch[...] * alpha + pv

    if causal and return_probs:
        # every block must write its praw tile (0 above the diagonal), so
        # the whole-block causal skip is disabled on this debug path
        _body(True)
    elif causal:
        # Whole block strictly above the diagonal band -> skip all compute.
        # (Static grid; predication is the TPU-native form of block skipping.)
        first_masked_col = qi * block_q + (block_q - 1) + shift + 1
        live = ki * block_k < first_masked_col
        can_split = (
            split_causal_mask
            and window is None
            and not has_segs
            and not has_pos
            and seqlen_k % block_k == 0
        )
        if can_split:
            # Fully-live blocks (every col <= every row's causal limit) take
            # a maskless body; only diagonal-straddling blocks pay the
            # [bq, bk] compare+select.  Predicating whole bodies at the
            # pl.when level is cheap (regions are skipped like the causal
            # block skip above), unlike the inner lax.cond.
            fully_live = (ki + 1) * block_k <= qi * block_q + shift + 1
            pl.when(live & fully_live)(lambda: _body(False))
            pl.when(live & jnp.logical_not(fully_live))(lambda: _body(True))
        else:
            pl.when(live)(_body)
    else:
        _body()

    @pl.when(is_last_k)
    def _finalize():
        l = l_scratch[:, :1]
        if clamped:
            # l = sum 2^{s_base2} = sum e^{s_nat} directly; a row is valid
            # iff any unmasked score survived underflow.
            valid = l > 0.0
            lse = jnp.where(
                valid, jnp.log(jnp.where(valid, l, 1.0)), NEG_INF
            )  # [bq, 1] natural-log units
            if verify:
                # row is exact iff its scores stayed inside the window
                # where clamp-free base-2 accumulation == online softmax;
                # dead rows (l == 0) are exact in both modes regardless
                m = m_scratch[:, :1]
                ok = jnp.logical_not(valid) | (
                    (m <= CLAMP2) & (m >= VERIFY_FLOOR2)
                )
                vstat_ref[0, 0] = ok.astype(jnp.float32)
        else:
            m = m_scratch[:, :1]
            # A row is valid iff some unmasked score was ever seen: its
            # running max left NEG_INF.  (Fully-masked rows may carry
            # garbage l/acc from the maskless fast path — discarded here.)
            valid = (l > 0.0) & (m > NEG_INF / 2)
            # lse is always emitted in natural-log units; under exp2 the
            # running max m lives in base-2 units and converts here
            # (ln(2^m * l)).
            m_nat = m * 0.6931471805599453 if use_exp2 else m
            lse = jnp.where(
                valid, m_nat + jnp.log(jnp.where(valid, l, 1.0)), NEG_INF
            )  # [bq, 1]
        out = jnp.where(valid, acc_scratch[...] / jnp.where(valid, l, 1.0), 0.0)
        out_ref[0, 0] = out.astype(out_dtype)
        lse_ref[0, 0] = lse.astype(jnp.float32)


def clamped_lse_valid(lse, seqlen_q: int, seqlen_k: int, *, causal=False,
                      window=None):
    """Scalar bool: every row of a CLAMPED-mode forward was exact.

    Free to evaluate (reads only the [B, H, Sq] lse the kernel already
    emits): any clamped element forces l >= 2^CLAMP2 so
    ``lse <= CLAMP2*ln2`` certifies no clamping, and
    ``lse >= VERIFY_FLOOR2*ln2`` bounds the mass lost to absolute
    underflow below fp32 rounding.  lse == -inf is exact iff the row is
    analytically dead (causal/window liveness — masks beyond that need the
    kernel-side tracker, softmax_mode='clamped_verify').

    Training recipe at full clamped speed (the measured lax.cond of
    softmax_mode='auto' costs ~0.08 of peak; this avoids it the way
    dynamic loss scaling does): run clamped, AND this flag across layers
    out of the jitted step, mask the optimizer update with it, and re-run
    the (rare) flagged step under online mode on the host.
    """
    LN2 = 0.6931471805599453
    i = jnp.arange(seqlen_q, dtype=jnp.int32)
    shift = seqlen_k - seqlen_q
    lo = jnp.zeros_like(i)
    if causal:
        hi = jnp.minimum(i + shift, seqlen_k - 1)
    else:
        hi = jnp.full_like(i, seqlen_k - 1)
    if window is not None:
        wl, wr = window
        if wl >= 0:
            lo = jnp.maximum(i + shift - wl, 0)
        if wr >= 0:
            hi = jnp.minimum(hi, i + shift + wr)
    row_live = hi >= lo  # [Sq]
    finite = lse > NEG_INF / 2
    ok_rows = jnp.where(
        finite,
        (lse <= CLAMP2 * LN2) & (lse >= VERIFY_FLOOR2 * LN2),
        ~row_live[None, None, :],  # -inf is exact iff the row is dead
    )
    return jnp.all(ok_rows)


def flash_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    causal: bool = False,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    window: tuple[int, int] | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    logit_softcap: float | None = None,
    alibi_slopes: jax.Array | None = None,
    config: FlashConfig | None = None,
    interpret: bool | None = None,
    causal_dma_skip: bool = True,
    return_softmax: bool = False,
):
    """FlashAttention-2 forward. q: [B,Sq,H,D]; k,v: [B,Sk,Hk,D] (BSHD, the
    reference layout, flash_attn.h:10-12). Returns (out [B,Sq,H,D],
    lse [B,H,Sq] fp32).

    rope_cos/rope_sin ([B,Sq,D/2] or [Sq,D/2] fp32): when given, q is
    rotated (rotate-half RoPE) *inside* the kernel at block-load time —
    pass the un-rotated q.  K must still be pre-rotated by the caller (its
    rotated form is what a KV cache stores anyway).

    logit_softcap: Gemma-2-style score capping, cap * tanh(s / cap),
    applied to the scaled scores before bias/mask.

    alibi_slopes ([H] fp32): per-head ALiBi bias
    -slope_h * |i + Sk - Sq - j| added in-kernel (ops/alibi.alibi_slopes
    builds the standard schedule) — no O(S^2) bias tensor.

    q_positions/kv_positions ([B,Sq]/[B,Sk] int32): when given, positions
    mask attention to kv_pos <= q_pos — the in-kernel form of per-sequence
    causal on packed varlen batches (compose with segment ids).

    return_softmax: also materialize the post-dropout probability matrix
    [B,H,Sq,Sk] fp32 through the kernel (the reference's softmax_ptr debug
    hook, flash_attn.h:15,30) — O(Sq*Sk) memory, testing/debug only.
    Returns (out, lse, probs).
    """
    if q.dtype == jnp.float16:
        # TPU has no IEEE-fp16 datapath (Mosaic rejects 'f16'; bf16 is the
        # hardware half type).  fp16 — the reference's non-bf16 half,
        # flash_attn.h:31 — computes as bf16 with the usual fp32
        # accumulators; outputs cast back.  Input rounding fp16->bf16 is
        # ~2^-8 relative, inside the half-precision test tolerance.
        res = flash_fwd(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), bias=bias,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_positions=q_positions, kv_positions=kv_positions,
            causal=causal, scale=scale, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, window=window, rope_cos=rope_cos,
            rope_sin=rope_sin, logit_softcap=logit_softcap,
            alibi_slopes=alibi_slopes, config=config, interpret=interpret,
            causal_dma_skip=causal_dma_skip, return_softmax=return_softmax,
        )
        out16 = res[0].astype(jnp.float16)
        return (out16, *res[1:])

    batch, seqlen_q, num_heads, head_dim = q.shape
    if config is None:
        from flash_attn_tpu.utils.autotune import get_config

        config = get_config(seqlen_q, k.shape[1], head_dim, q.dtype)
    cfg = config
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    batch, seqlen_q, num_heads, head_dim = q.shape
    _, seqlen_k, num_heads_k, _ = k.shape
    if num_heads % num_heads_k:
        raise ValueError(f"num_heads {num_heads} not divisible by num_heads_k {num_heads_k}")
    group = num_heads // num_heads_k
    if scale is None:
        scale = head_dim**-0.5

    block_q = min(cfg.block_q, max(_cdiv(seqlen_q, 8) * 8, 8))
    block_k = min(cfg.block_k, max(_cdiv(seqlen_k, 128) * 128, 128))

    # Triangular flattened grid (causal only): enumerate only the live
    # (qi, ki) pairs; dead above-diagonal steps don't exist.  Disabled for
    # return_softmax, whose dead praw tiles must still be written as zeros.
    use_tri = bool(causal and cfg.triangular and not return_softmax)

    if cfg.softmax_mode == "auto":
        # Hybrid (r4 VERDICT item 9): clamped-kernel speed with exact
        # online semantics.  Run the stats-free clamped kernel; decide
        # per-row exactness and lax.cond into the online kernel if any
        # row left the exactness window.
        #
        # The cheap validity test comes from the clamped kernel's OWN lse:
        # any clamped element forces l >= 2^CLAMP2, so lse <= CLAMP2*ln2
        # certifies no clamping; and lse >= VERIFY_FLOOR2*ln2 bounds the
        # relative mass lost to absolute underflow (elements below 2^-126)
        # by Sk * 2^(VERIFY_FLOOR2 - (-126)) ~ 2^-33 — below fp32 rounding.
        # The one case lse can't separate is lse == -inf: a fully-MASKED
        # row (exact in both modes) vs a fully-UNDERFLOWED row (clamped is
        # wrong, online isn't).  Dense/causal/window liveness is analytic
        # (computed below for free); with bias/segments/positions the
        # kernel-side range tracker (clamped_verify, measured ~0.635 of
        # peak vs clamped's 0.733 — the [bq,bk] max reduce IS most of the
        # online stats cost) distinguishes instead.
        import dataclasses

        kw = dict(
            bias=bias, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, q_positions=q_positions,
            kv_positions=kv_positions, causal=causal, scale=scale,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            window=window, rope_cos=rope_cos, rope_sin=rope_sin,
            logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
            interpret=interpret, causal_dma_skip=causal_dma_skip,
        )
        if return_softmax:
            # debug path: no verify plumbing, just exact online
            return flash_fwd(
                q, k, v,
                config=dataclasses.replace(cfg, softmax_mode="online"),
                return_softmax=True, **kw,
            )
        analytic_live = (
            bias is None and q_segment_ids is None and q_positions is None
        )
        if analytic_live:
            out_c, lse_c = flash_fwd(
                q, k, v,
                config=dataclasses.replace(cfg, softmax_mode="clamped"),
                **kw,
            )
            ok = clamped_lse_valid(
                lse_c, q.shape[1], k.shape[1], causal=causal, window=window
            )
        else:
            out_c, lse_c, valid = flash_fwd(
                q, k, v,
                config=dataclasses.replace(
                    cfg, softmax_mode="clamped_verify"
                ),
                **kw,
            )
            ok = jnp.min(valid) > 0.5

        def exact(_):
            return flash_fwd(
                q, k, v,
                config=dataclasses.replace(cfg, softmax_mode="online"),
                **kw,
            )

        return jax.lax.cond(ok, lambda _: (out_c, lse_c), exact, None)

    # Pre-fold the softmax scale into q (one multiply on the small operand
    # instead of a [bq, bk] multiply per kernel step).
    LOG2E = 1.4426950408889634
    clamped = cfg.softmax_mode in ("clamped", "clamped_verify")
    verify = cfg.softmax_mode == "clamped_verify"
    if cfg.softmax_mode not in ("online", "clamped", "clamped_verify"):
        raise ValueError(f"unknown softmax_mode {cfg.softmax_mode!r}")
    if verify and return_softmax:
        raise ValueError("clamped_verify does not compose with return_softmax")
    base2 = cfg.exp2 or clamped  # clamped mode always works in base-2 units
    eff_scale = scale * LOG2E if base2 else scale
    # softcap operates on natural-units scores; in base-2 modes s = nat*LOG2E
    # and c2*tanh(s/c2) with c2 = cap*LOG2E equals LOG2E*(cap*tanh(nat/cap)).
    eff_softcap = (
        None if logit_softcap is None
        else float(logit_softcap) * (LOG2E if base2 else 1.0)
    )
    q_scaled = (q.astype(jnp.float32) * eff_scale).astype(q.dtype)
    if bias is not None and base2:
        # kernel works in base-2 score units; additive bias must match
        bias = bias.astype(jnp.float32) * LOG2E
    # BSHD -> BHSD for clean [bq, d] blocks, pad seq dims to block multiples.
    qt = _pad_axis(jnp.swapaxes(q_scaled, 1, 2), 2, block_q)
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 2, block_k)
    sq_p, sk_p = qt.shape[2], kt.shape[2]
    num_q_blocks = sq_p // block_q
    num_k_blocks = sk_p // block_k

    shift_br = seqlen_k - seqlen_q  # bottom-right causal alignment
    if use_tri:
        import numpy as np

        qis, kis, lasts = [], [], []
        for qi_ in range(num_q_blocks):
            hi = (qi_ * block_q + block_q - 1 + shift_br) // block_k
            hi = max(0, min(num_k_blocks - 1, hi))
            for ki_ in range(hi + 1):
                qis.append(qi_)
                kis.append(ki_)
                lasts.append(1 if ki_ == hi else 0)
        tri = jnp.asarray(np.array([qis, kis, lasts], np.int32))

        def M(f):
            # index maps read block coords from the prefetched pair list
            return lambda b, h, l, seed, tr: f(b, h, tr[0, l], tr[1, l])

    else:
        tri = jnp.zeros((3, 1), jnp.int32)

        def M(f):
            return lambda b, h, qi, ki, *_: f(b, h, qi, ki)

    has_bias = bias is not None
    has_segs = q_segment_ids is not None
    if has_segs and kv_segment_ids is None:
        raise ValueError("q_segment_ids given without kv_segment_ids")

    if has_bias:
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (batch, num_heads, seqlen_q, seqlen_k)
        )
        bias = _pad_axis(_pad_axis(bias, 2, block_q), 3, block_k)
        bias_spec = pl.BlockSpec(
            (1, 1, block_q, block_k), M(lambda b, h, qi, ki: (b, h, qi, ki))
        )
    else:
        bias = jnp.zeros((1, 1, block_q, block_k), jnp.float32)
        bias_spec = pl.BlockSpec(
            (1, 1, block_q, block_k), M(lambda b, h, qi, ki: (0, 0, 0, 0))
        )

    # TPU-legal seg layouts: qseg [B, Sq, 1] (column), kseg [B, 1, Sk] (row);
    # the in-kernel compare broadcasts (bq,1) == (1,bk) directly.
    if has_segs:
        qseg = _pad_axis(q_segment_ids.astype(jnp.int32), 1, block_q)[..., None]
        # pad KV segment ids with -1 so padding never matches a real segment
        ksz = kv_segment_ids.shape[1]
        kseg = jnp.pad(
            kv_segment_ids.astype(jnp.int32),
            ((0, 0), (0, sk_p - ksz)),
            constant_values=-1,
        )[:, None, :]
    else:
        qseg = jnp.zeros((batch, block_q, 1), jnp.int32)
        kseg = jnp.zeros((batch, 1, block_k), jnp.int32)
    qseg_spec = pl.BlockSpec(
        (1, block_q, 1),
        M(lambda b, h, qi, ki: (b, qi, 0)) if has_segs
        else M(lambda b, h, qi, ki: (0, 0, 0)),
    )
    kseg_spec = pl.BlockSpec(
        (1, 1, block_k),
        M(lambda b, h, qi, ki: (b, 0, ki)) if has_segs
        else M(lambda b, h, qi, ki: (0, 0, 0)),
    )

    has_pos = q_positions is not None
    if has_pos and kv_positions is None:
        raise ValueError("q_positions given without kv_positions")
    if has_pos:
        BIG = jnp.int32(2**30)
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
    qpos_spec = pl.BlockSpec(
        (1, block_q, 1),
        M(lambda b, h, qi, ki: (b, qi, 0)) if has_pos
        else M(lambda b, h, qi, ki: (0, 0, 0)),
    )
    kpos_spec = pl.BlockSpec(
        (1, 1, block_k),
        M(lambda b, h, qi, ki: (b, 0, ki)) if has_pos
        else M(lambda b, h, qi, ki: (0, 0, 0)),
    )

    has_alibi = alibi_slopes is not None
    if has_alibi:
        al = jnp.asarray(alibi_slopes, jnp.float32).reshape(num_heads, 1, 1)
        if base2:
            al = al * LOG2E  # bias must live in base-2 score units too
        alibi_spec = pl.BlockSpec(
            (1, 1, 1), M(lambda b, h, qi, ki: (h, 0, 0))
        )
    else:
        al = jnp.zeros((1, 1, 1), jnp.float32)
        alibi_spec = pl.BlockSpec(
            (1, 1, 1), M(lambda b, h, qi, ki: (0, 0, 0))
        )

    has_rope = rope_cos is not None
    if has_rope:
        if rope_sin is None:
            raise ValueError("rope_cos given without rope_sin")
        if head_dim % 2:
            raise ValueError("rope requires even head_dim")
        d2 = head_dim // 2
        rc = jnp.asarray(rope_cos, jnp.float32)
        rs = jnp.asarray(rope_sin, jnp.float32)
        if rc.ndim == 2:
            rc, rs = rc[None], rs[None]
        if rc.shape[-1] != d2 or rc.ndim != 3:
            raise ValueError(
                f"rope_cos must be [B,Sq,{d2}] or [Sq,{d2}], got {rc.shape}"
            )
        rc = jnp.broadcast_to(rc, (batch, seqlen_q, d2))
        rs = jnp.broadcast_to(rs, (batch, seqlen_q, d2))
        # One [B, Sq, D] table (cos | sin halves): full-lane blocks, a single
        # input stream whose DMA only re-fires when qi changes.
        rope_cs = _pad_axis(jnp.concatenate([rc, rs], axis=-1), 1, block_q)
        rope_spec = pl.BlockSpec(
            (1, block_q, head_dim), M(lambda b, h, qi, ki: (b, qi, 0))
        )
    else:
        rope_cs = jnp.zeros((1, block_q, head_dim), jnp.float32)
        rope_spec = pl.BlockSpec(
            (1, block_q, head_dim), M(lambda b, h, qi, ki: (0, 0, 0))
        )

    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    if use_tri:
        grid = (batch, num_heads, int(tri.shape[1]))
        dim_sems = ("parallel", "parallel", "arbitrary")
    else:
        grid = (batch, num_heads, num_q_blocks, num_k_blocks)
        dim_sems = ("parallel", "parallel", "parallel", "arbitrary")

    # Causal DMA skip: steps whose k-block lies strictly above the diagonal
    # band are predicated off in the kernel; clamping their K/V index map to
    # the last *useful* block makes Pallas see an unchanged block index and
    # skip the DMA too — above-diagonal steps cost neither bandwidth nor
    # compute (the TPU-native form of FlashAttention's block skipping).
    if causal and causal_dma_skip and not use_tri:
        # (With use_tri dead steps are never enumerated, so no clamp needed.)
        def clamp_ki(qi, ki):
            last_useful = (
                qi * block_q + (block_q - 1) + shift_br
            ) // block_k
            return jnp.minimum(ki, jnp.maximum(last_useful, 0))

    else:

        def clamp_ki(qi, ki):
            return ki

    kernel = functools.partial(
        _fwd_kernel,
        seqlen_q=seqlen_q,
        seqlen_k=seqlen_k,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=num_k_blocks,
        causal=causal,
        window=window,
        dropout_rate=float(dropout_rate),
        has_bias=has_bias,
        has_segs=has_segs,
        has_pos=has_pos,
        has_rope=has_rope,
        has_alibi=has_alibi,
        softcap=eff_softcap,
        use_exp2=base2,
        clamped=clamped,
        verify=verify,
        split_causal_mask=cfg.split_causal_mask,
        flattened=use_tri,
        soft_bf16=cfg.softmax_dtype == "bf16",
        return_probs=return_softmax,
        out_dtype=q.dtype,
    )

    flops = 4 * batch * num_heads * seqlen_q * seqlen_k * head_dim
    if causal:
        flops //= 2
    bytes_accessed = (
        qt.size * qt.dtype.itemsize
        + kt.size * kt.dtype.itemsize
        + vt.size * vt.dtype.itemsize
        + qt.size * qt.dtype.itemsize
    )

    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), M(lambda b, h, qi, ki: (b, h, qi, 0))),
                pl.BlockSpec(
                    (1, 1, block_k, head_dim),
                    M(lambda b, h, qi, ki, g=group: (b, h // g, clamp_ki(qi, ki), 0)),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, head_dim),
                    M(lambda b, h, qi, ki, g=group: (b, h // g, clamp_ki(qi, ki), 0)),
                ),
                bias_spec,
                qseg_spec,
                kseg_spec,
                qpos_spec,
                kpos_spec,
                rope_spec,
                alibi_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), M(lambda b, h, qi, ki: (b, h, qi, 0))),
                # lse rides a trailing length-1 lane dim: [B, H, Sq, 1] is the
                # Mosaic-legal layout for per-row statistics.
                pl.BlockSpec((1, 1, block_q, 1), M(lambda b, h, qi, ki: (b, h, qi, 0))),
            ] + ([
                pl.BlockSpec((1, 1, block_q, block_k), M(lambda b, h, qi, ki: (b, h, qi, ki))),
                # per-(qi, ki) running max: ki rides a LEADING block dim of
                # size 1 (Mosaic only constrains the last two dims; a
                # trailing num_k_blocks-wide dim with block 1 is illegal)
                pl.BlockSpec((1, 1, 1, block_q, 1), M(lambda b, h, qi, ki: (b, h, ki, qi, 0))),
            ] if return_softmax else []) + ([
                # clamped_verify per-row validity flag (same layout as lse)
                pl.BlockSpec((1, 1, block_q, 1), M(lambda b, h, qi, ki: (b, h, qi, 0))),
            ] if verify else []),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, sq_p, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, sq_p, 1), jnp.float32),
        ] + ([
            jax.ShapeDtypeStruct((batch, num_heads, sq_p, sk_p), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch, num_heads, num_k_blocks, sq_p, 1), jnp.float32
            ),
        ] if return_softmax else []) + ([
            jax.ShapeDtypeStruct((batch, num_heads, sq_p, 1), jnp.float32),
        ] if verify else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sems,
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=batch * num_heads * seqlen_q * seqlen_k
        ),
        interpret=interpret,
    )(seed, tri, qt, kt, vt, bias, qseg, kseg, qpos, kpos, rope_cs, al)

    out, lse = results[0], results[1]
    out = jnp.swapaxes(out[:, :, :seqlen_q, :], 1, 2)  # BHSD -> BSHD
    lse = lse[:, :, :seqlen_q, 0]
    if verify:
        return out, lse, results[2][:, :, :seqlen_q, 0]
    if not return_softmax:
        return out, lse
    # Renormalize the per-step unnormalized tiles to true post-dropout
    # probabilities: P = praw * exp(m_step - lse).  Rows with lse = -inf
    # (fully masked) are zeroed; above-diagonal tiles zero out because their
    # m_step is NEG_INF (or praw is 0).
    praw, mblk = results[2], results[3]
    lse_p = results[1][..., 0:1]  # padded [B, H, sq_p, 1] fp32
    mblk = jnp.moveaxis(mblk[..., 0], 2, 3)  # [B, H, sq_p, num_k_blocks]
    m_full = jnp.repeat(mblk, block_k, axis=3)  # [B, H, sq_p, sk_p]
    probs = praw * jnp.exp(m_full - lse_p)
    probs = jnp.where(lse_p > NEG_INF / 2, probs, 0.0)
    probs = probs[:, :, :seqlen_q, :seqlen_k]
    return out, lse, probs
