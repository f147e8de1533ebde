"""Paged flash-decode: scalar-prefetch Pallas kernel over a page table.

The round-1 paged path materialised the whole contiguous cache per step via
an XLA gather (engine/paged.py round-1 note) — at 8B/8k that copies the full
KV cache through HBM every decode step, negating paging.  Here the page
table rides the kernel's *scalar prefetch*: the K/V BlockSpec index maps read
``block_table[b, page_step]`` directly, so Mosaic DMAs exactly the pages a
sequence owns, straight from the pool — zero gather, zero copy.

This is the TPU-native equivalent of the reference's split-K decode
machinery (``num_splits``, flash_attn.h:94) composed with a vLLM-style page
table; pages are whole KV tiles ([Hk, page, D] blocks, lane-aligned), which
is the granularity TPUs need (SURVEY.md §7 hard part (d)).

Layouts (decode-optimal, heads-major like ops/decode.py's BHSD kernel):
  k_pages, v_pages: [num_pages, Hk, page, D]    (page 0 = null page)
  k_scale, v_scale: [num_pages, Hk, 1, page]    lane-dense per-token scales
  block_table:      [B, max_pages] int32
  kv_length:        [B] int32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.ops.decode import (
    CLAMP2_DEC,
    CLAMP2_DEC_FP8,
    E4M3_FIX,
    LOG2E,
    P_SHIFT2,
    P_SHIFT_LN2,
    _fast_cast,
    _packed_e4m3_halves,
    _perm_cols,
)
from flash_attn_tpu.ops.flash_fwd import sdot

NEG_INF = -1e30


def _paged_decode_kernel(
    tbl_ref,    # scalar prefetch [B, max_pages]
    len_ref,    # scalar prefetch [B]
    clamp_ref,  # scalar prefetch [2, B] (last live page, first live page)
    q_ref,      # [1, H, D]
    *refs,      # G k blocks, G v blocks, G ks blocks, G vs blocks
                # (each [1, Hk, page, D] / [1, Hk, 1, page], page selected
                # by its index map via the table), then outputs + scratch
    page: int,
    group_pages: int,
    num_page_steps: int,
    num_heads: int,
    num_heads_k: int,
    scale: float,
    has_k_scale: bool,
    has_v_scale: bool,
    packed_fp8: bool,
    out_dtype,
    clamped: bool = False,
    chunk: int = 1,
    window: int | None = None,
    softcap: float | None = None,
):
    G = group_pages
    k_refs = refs[:G]
    v_refs = refs[G:2 * G]
    ks_refs = refs[2 * G:3 * G]
    vs_refs = refs[3 * G:4 * G]
    o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = refs[4 * G:]
    b, pi = pl.program_id(0), pl.program_id(1)
    group = num_heads // num_heads_k
    rows = page * G  # KV rows per grid step

    @pl.when(pi == 0)
    def _init():
        if not clamped:  # m never read in clamped mode
            m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = len_ref[b]
    compute_dtype = (
        jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    )

    def _body(need_mask):
        q = q_ref[0].astype(compute_dtype)  # [H, D]
        # scalar softmax scale folded into q in-kernel ([H, D] multiply per
        # step, not [H, page] on the scores — same finding as ops/decode.py
        # r2j); clamped mode works in base-2 units, LOG2E rides the fold.
        # With packed fp8, K's 2^120 rebias (E4M3_FIX) rides the same fold.
        q = q * jnp.asarray(
            scale
            * (E4M3_FIX if packed_fp8 else 1.0)
            * (LOG2E if clamped else 1.0),
            compute_dtype,
        )
        qg = q.reshape(num_heads_k, group, q.shape[-1])
        # one QK dot per sub-page, scores concatenated along the lane axis:
        # the G-pages-per-step grid amortizes the per-step stat passes and
        # scratch traffic over G*page rows (small pages previously paid the
        # fixed per-step cost per page — the page=256 2x cliff), while the
        # score concat is the CHEAP concat (16K elems vs the 512K-elem KV
        # concat the packed-fp8 decode already avoids).
        parts = []
        for j in range(G):
            if packed_fp8:
                # Packed-pair e4m3 decode (ops/decode._packed_e4m3_halves) +
                # two half-GEMMs on the (evens, odds) planes — 2.3x the
                # per-element bit-decode; scores land in packed
                # (evens-then-odds) page-row order, which the pool's
                # PRE-PERMUTED scale pages and the mask's column permute
                # below both match.
                k_ev, k_od = _packed_e4m3_halves(k_refs[j][0])
                s_ev = sdot(qg, k_ev, (((2,), (2,)), ((0,), (0,))))
                s_od = sdot(qg, k_od, (((2,), (2,)), ((0,), (0,))))
                sj = jnp.concatenate([s_ev, s_od], axis=-1)  # [Hk, g, page]
            else:
                kj = _fast_cast(k_refs[j][0], compute_dtype)  # [Hk, page, D]
                sj = sdot(qg, kj, (((2,), (2,)), ((0,), (0,))))
            if has_k_scale:
                sj = sj * ks_refs[j][0].astype(jnp.float32)  # [Hk, 1, page]
            parts.append(sj)
        s = parts[0] if G == 1 else jnp.concatenate(parts, axis=-1)
        s = s.reshape(num_heads, rows)
        if softcap is not None:
            # cap the TRUE scaled scores (post k_scale / fp8-rebias
            # cancellation); base-2 (clamped) mode pre-scales the cap
            s = softcap * jnp.tanh(s / softcap)

        if need_mask:
            r = jax.lax.broadcasted_iota(jnp.int32, (num_heads, rows), 1)
            if packed_fp8:
                # scores follow packed row order WITHIN each page chunk
                r = (r // page) * page + _perm_cols(r % page, page)
            col = pi * rows + r
            if chunk > 1:
                # Chunk mode (paged_flash_decode_chunk): rows are virtual
                # heads in (hk, t, g) order; chunk token t attends to
                # positions < kv_len - chunk + 1 + t (same scheme as
                # ops/decode.py's chunk decode).
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (num_heads, 1), 0
                )
                t = (row % group) // (group // chunk)
                limit = kv_len - (chunk - 1) + t
            else:
                limit = kv_len
            keep = col < limit
            if window is not None:
                # sliding-window decode: each row attends to the last
                # `window` positions below its causal limit
                keep &= col >= limit - window
            s = jnp.where(keep, s, NEG_INF)

        l_prev = l_scratch[:, :1]
        if clamped:
            # no running max (ops/decode.py softmax_mode="clamped"
            # contract): masked NEG_INF cols exp2 to exactly 0.  Packed fp8
            # inflates p by 2^60 (V's rebias half; see ops/decode.py) and
            # uses the lower score ceiling.
            sc = jnp.minimum(s, CLAMP2_DEC_FP8 if packed_fp8 else CLAMP2_DEC)
            if packed_fp8:
                sc = sc + P_SHIFT2
            p = jax.lax.exp2(sc)
            alpha = None
            l_new = l_prev + jnp.sum(p, axis=1, keepdims=True)
        else:
            m_prev = m_scratch[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            if packed_fp8:
                # 2^60 p-inflation folded into the [H, 1] max-shift (free);
                # PV products then sit 2^-60 below true scale — above the
                # fp32 denormal flush; _finalize repays the full 2^120.
                p = jnp.exp(s - (m_new - P_SHIFT_LN2))
            else:
                p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            # narrow [:, :1] stat writes, not 128-lane broadcasts (~+4%,
            # same finding as the contiguous decode kernel)
            m_scratch[:, :1] = m_new
        l_scratch[:, :1] = l_new

        pg = p.reshape(num_heads_k, group, rows)
        o = None
        for j in range(G):
            pj = pg[:, :, j * page:(j + 1) * page]
            if has_v_scale:
                pj = pj * vs_refs[j][0].astype(jnp.float32)
            if packed_fp8:
                v_ev, v_od = _packed_e4m3_halves(v_refs[j][0])
                half = page // 2
                pc = pj.astype(compute_dtype)
                oj = sdot(pc[:, :, :half], v_ev, (((2,), (1,)), ((0,), (0,))))
                oj = oj + sdot(
                    pc[:, :, half:], v_od, (((2,), (1,)), ((0,), (0,)))
                )
                d_out = v_ev.shape[-1]
            else:
                vj = _fast_cast(v_refs[j][0], compute_dtype)  # [Hk, page, D]
                oj = sdot(
                    pj.astype(compute_dtype), vj, (((2,), (1,)), ((0,), (0,)))
                )
                d_out = vj.shape[-1]
            o = oj if o is None else o + oj
        o = o.reshape(num_heads, d_out)
        if clamped:
            acc_scratch[...] = acc_scratch[...] + o
        else:
            acc_scratch[...] = acc_scratch[...] * alpha + o

    # mask generation only on the step straddling kv_len; fully-valid steps
    # (the common case) take the maskless body.  In chunk mode a step is
    # maskless only if valid for the strictest row (t=0).
    live = pi * rows < kv_len
    full = (pi + 1) * rows <= kv_len - (chunk - 1)
    if window is not None:
        live &= (pi + 1) * rows > kv_len - (chunk - 1) - window
        full &= pi * rows >= kv_len - window
    pl.when(live & full)(lambda: _body(False))
    pl.when(live & ~full)(lambda: _body(True))

    @pl.when(pi == num_page_steps - 1)
    def _finalize():
        l = l_scratch[:, :1]
        if clamped:
            valid = l > 0.0
            lse_raw = jnp.log(jnp.where(valid, l, 1.0))
        else:
            m = m_scratch[:, :1]
            valid = (l > 0.0) & (m > NEG_INF / 2)
            lse_raw = m + jnp.log(jnp.where(valid, l, 1.0))
        acc = acc_scratch[...]
        if packed_fp8:
            # Pay back V's rebias BEFORE the divide (acc/l alone would be
            # out_true * 2^-120 — fp32 denormal territory); see the
            # contiguous kernel's _finalize for the range argument.
            acc = acc * E4M3_FIX
            lse_raw = lse_raw - P_SHIFT_LN2
        o_ref[0] = jnp.where(
            valid, acc / jnp.where(valid, l, 1.0), 0.0
        ).astype(out_dtype)
        lse_ref[0] = jnp.where(valid, lse_raw, NEG_INF).astype(jnp.float32)


def paged_flash_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_table: jax.Array,
    kv_length: jax.Array,
    *,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    scale: float | None = None,
    interpret: bool | None = None,
    return_lse: bool = False,
    softmax_mode: str | None = None,
    chunk: int = 1,
    window: int | None = None,
    scales_permuted: bool = False,
    logit_softcap: float | None = None,
    target_rows: int | None = None,
):
    """Single-token decode attention over a paged KV pool.

    q: [B, H, D]; pools/tables as module docstring. Returns out [B, H, D]
    (+ lse [B, H] fp32 with return_lse).  softmax_mode as in
    ops/decode.flash_decode ("clamped" drops the running max).  ``chunk``
    is internal (use paged_flash_decode_chunk): q rows are virtual heads.

    fp8 e4m3 pages take the packed-pair decode (two half-GEMMs on the
    evens/odds planes — ops/decode._packed_e4m3_halves) on Mosaic; scales
    must then be in packed (evens-then-odds per page) lane order.
    ``scales_permuted`` declares the caller's scale layout: PagedKVPool
    stores fp8 scales pre-permuted (True); natural-order scales are
    permuted/unpermuted here at call time to match the selected kernel.
    ``target_rows`` overrides the KV rows grouped per grid step (tuning
    knob; default = shipped autotune entry for (page, dtype), else the
    static per-dtype value).
    """
    if softmax_mode is None:
        from flash_attn_tpu.ops.decode import _default_softmax_mode

        softmax_mode = _default_softmax_mode(k_pages.dtype, logit_softcap)
    if softmax_mode not in ("online", "clamped"):
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}")
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    batch, num_heads, head_dim = q.shape
    num_pages, num_heads_k, page, _ = k_pages.shape
    max_pages = block_table.shape[1]
    if scale is None:
        scale = head_dim**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    has_ks = k_scale is not None
    has_vs = v_scale is not None

    # Packed-pair fp8 page decode: Mosaic-only (pltpu.bitcast width change
    # has no interpret lowering) and needs 4 sequence rows per i32 word.
    packed_fp8 = (
        k_pages.dtype == jnp.float8_e4m3fn
        and v_pages.dtype == jnp.float8_e4m3fn
        and not interpret
        and page % 4 == 0
    )
    if packed_fp8 != scales_permuted and (has_ks or has_vs):
        # Reconcile the scale lane order with the kernel actually selected
        # (O(pool) per call — only hit by interpret-mode tests on permuted
        # pools or natural-order callers on the packed path).
        from flash_attn_tpu.ops.decode import _permute_scale_lanes

        if packed_fp8:
            fix = lambda s: _permute_scale_lanes(s, page)  # noqa: E731
        else:
            half = page // 2
            import numpy as np

            inv = np.empty((page,), np.int32)  # natural[p] = stored[inv[p]]
            inv[0::2] = np.arange(half)
            inv[1::2] = half + np.arange(page - half)
            fix = lambda s: s[..., inv]  # noqa: E731
        k_scale = fix(k_scale) if has_ks else None
        v_scale = fix(v_scale) if has_vs else None

    # G pages per grid step: small pages previously paid the per-step fixed
    # costs (stat passes, scratch traffic, DMA issue) once per page — the
    # measured page=256 cliff (0.454 of roofline vs 0.95+ at 512).  Group
    # enough pages per step to reach the contiguous kernel's block size;
    # the pool rides in G times with per-sub-page index maps, so each step
    # still DMAs exactly the (scattered) pages the sequence owns.
    if target_rows is None:
        from flash_attn_tpu.utils.autotune import get_paged_rows

        target_rows = get_paged_rows(page, k_pages.dtype)
    if target_rows is None:
        target_rows = 2048 if k_pages.dtype.itemsize == 1 else 512
    group_pages = max(1, min(target_rows // page, max_pages))
    mp = -(-max_pages // group_pages) * group_pages
    if mp != max_pages:
        block_table = jnp.pad(block_table, ((0, 0), (0, mp - max_pages)))
    num_steps = mp // group_pages

    # Host-precomputed page clamps: dead page steps (beyond a sequence's
    # length, or below its sliding window) clamp to the nearest live page so
    # Mosaic sees an unchanged block index and skips the DMA.  Precomputing
    # [2, B] on the host removes the scalar divides the index maps used to
    # run per grid step per operand (the contiguous kernel's kv_clamp
    # finding).
    last_live = jnp.maximum(
        (kv_length.astype(jnp.int32) + page - 1) // page - 1, 0
    )
    if window is None:
        first_live = jnp.zeros_like(last_live)
    else:
        first_live = (
            jnp.maximum(kv_length.astype(jnp.int32) - (chunk - 1) - window, 0)
            // page
        )
    page_clamp = jnp.stack([last_live, first_live])  # [2, B]

    def page_map(j):
        def m(b, pi, tbl_ref, len_ref, clamp_ref):
            pc = pi * group_pages + j
            if window is not None:
                pc = jnp.maximum(pc, clamp_ref[1, b])
            return (tbl_ref[b, jnp.minimum(pc, clamp_ref[0, b])], 0, 0, 0)

        return m

    def kv_spec(j):
        return pl.BlockSpec((1, num_heads_k, page, head_dim), page_map(j))

    def scale_spec(has, j):
        if has:
            return pl.BlockSpec((1, num_heads_k, 1, page), page_map(j))
        return pl.BlockSpec(
            (1, num_heads_k, 1, 1), lambda b, pi, *_: (0, 0, 0, 0)
        )

    dummy = jnp.zeros((1, num_heads_k, 1, 1), jnp.float32)
    ks = k_scale if has_ks else dummy
    vs = v_scale if has_vs else dummy
    G = group_pages

    kernel = functools.partial(
        _paged_decode_kernel,
        page=page,
        group_pages=G,
        num_page_steps=num_steps,
        num_heads=num_heads,
        num_heads_k=num_heads_k,
        scale=float(scale),
        has_k_scale=has_ks,
        has_v_scale=has_vs,
        packed_fp8=packed_fp8,
        out_dtype=q.dtype,
        clamped=softmax_mode == "clamped",
        chunk=chunk,
        window=window,
        softcap=(
            None if logit_softcap is None
            else float(logit_softcap)
            * (LOG2E if softmax_mode == "clamped" else 1.0)
        ),
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_steps),
            in_specs=[
                pl.BlockSpec(
                    (1, num_heads, head_dim), lambda b, pi, *_: (b, 0, 0)
                ),
                *[kv_spec(j) for j in range(G)],
                *[kv_spec(j) for j in range(G)],
                *[scale_spec(has_ks, j) for j in range(G)],
                *[scale_spec(has_vs, j) for j in range(G)],
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, num_heads, head_dim), lambda b, pi, *_: (b, 0, 0)
                ),
                pl.BlockSpec((1, num_heads, 1), lambda b, pi, *_: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((num_heads, 128), jnp.float32),
                pltpu.VMEM((num_heads, 128), jnp.float32),
                pltpu.VMEM((num_heads, head_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * max_pages * page * head_dim,
            bytes_accessed=int(
                2 * batch * max_pages * page * num_heads_k * head_dim
            ),
            transcendentals=batch * num_heads * max_pages * page,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        kv_length.astype(jnp.int32),
        page_clamp,
        q,
        *([k_pages] * G),
        *([v_pages] * G),
        *([ks] * G),
        *([vs] * G),
    )
    if return_lse:
        return out, lse[..., 0]
    return out


def paged_flash_decode_chunk(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_table: jax.Array,
    kv_length: jax.Array,
    *,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    scale: float | None = None,
    interpret: bool | None = None,
    return_lse: bool = False,
    softmax_mode: str | None = None,
    window: int | None = None,
    scales_permuted: bool = False,
    logit_softcap: float | None = None,
):
    """Multi-token ("chunk") attention over a paged KV pool: T query tokens
    per sequence, causal within the chunk — the paged analog of
    ops/decode.flash_decode_chunk (chunked/suffix prefill and speculative
    verify read the cache once, straight from the pages, no gather).

    q: [B, T, H, D].  The pool must already hold the chunk's own KV at
    positions kv_length-T .. kv_length-1 (append first, then score).
    kv_length INCLUDES the chunk's T tokens; chunk token t attends to
    positions < kv_length - T + 1 + t.

    Returns out [B, T, H, D] (+ lse [B, T, H] with return_lse).
    """
    batch, chunk, num_heads, head_dim = q.shape
    num_heads_k = k_pages.shape[1]
    group = num_heads // num_heads_k
    # (hk, t, g)-major virtual heads: each kv head's rows stay contiguous
    # so the kernel's [Hk, group', D] reshape needs no in-kernel transpose
    q2 = (
        q.reshape(batch, chunk, num_heads_k, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(batch, num_heads_k * chunk * group, head_dim)
    )
    res = paged_flash_decode(
        q2, k_pages, v_pages, block_table, kv_length, k_scale=k_scale,
        v_scale=v_scale, scale=scale, interpret=interpret,
        return_lse=return_lse, softmax_mode=softmax_mode, chunk=chunk,
        window=window, scales_permuted=scales_permuted,
        logit_softcap=logit_softcap,
    )
    out = res[0] if return_lse else res

    def unshuffle(x):
        rest = x.shape[2:]
        return (
            x.reshape(batch, num_heads_k, chunk, group, *rest)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
            .reshape(batch, chunk, num_heads, *rest)
        )

    out = unshuffle(out)
    if return_lse:
        return out, unshuffle(res[1])
    return out
