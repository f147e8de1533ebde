"""Flash-decode: split-KV attention for the decode phase (one query token per
sequence, long KV), merged with the LSE algebra.

This is the TPU-native form of the reference's split-K machinery
(``num_splits`` + fp32 accumulation, flash_attn.h:94,79): KV is cut into
splits, each split produces a partial (out, lse), and partials merge exactly
via lse_merge — the same algebra that powers ring attention.  The decode
kernel is the north-star metric path (BASELINE.json: tokens/sec/chip with
quantized KV), so it supports an int8/fp8-quantized KV cache with dequant
fused into the QK^T and PV contractions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.ops.lse import lse_merge
from flash_attn_tpu.ops.flash_fwd import sdot

NEG_INF = -1e30


def _fast_cast(x, compute_dtype):
    """Block cast into the MXU compute dtype.

    fp8 e4m3 goes through a manual integer bit-decode: Mosaic's native
    fp8->bf16 convert runs at ~5% of VPU bandwidth on v5e (measured), while
    sign/exponent/mantissa reassembly in int32 runs at full rate.
      bf16_bits = sign<<8 | ((exp_mant << 4) + (120 << 7))
    (e4m3 bias 7 -> bf16 bias 127 = +120; mantissa 3 -> 7 bits = <<4).
    Denormals (exp==0) flush to zero — KV values below 2^-6 of the block
    absmax are attention-negligible.  e4m3 has no inf; NaN (0x7f) decodes
    to a large finite value, which the quantizer never emits.
    """
    if x.dtype == jnp.float8_e4m3fn and compute_dtype == jnp.bfloat16:
        u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        sign = (u & 0x80) << 8
        expmant = u & 0x7F
        bits = sign | ((expmant << 4) + (120 << 7))
        bits = jnp.where(expmant < 8, 0, bits)  # denormals/zero -> 0
        return jax.lax.bitcast_convert_type(
            bits.astype(jnp.uint16), jnp.bfloat16
        )
    return x.astype(compute_dtype)


def _packed_e4m3_to_bf16(x):
    """Packed-pair e4m3 -> bf16 decode, 2.3x the element-wise bit-decode
    (222 vs 507 us on a v5e K-stream at the 8B decode shape).

    pltpu.bitcast packs 4 consecutive sequence rows per i32 word (measured:
    word i holds rows 4i..4i+3, little-endian).  Even and odd bytes are
    decoded as *pairs inside the i32 lane* — two bf16 results per word per
    path, at ~3.5 int-ops/element instead of ~10:

      e4m3 (s eeee mmm, bias 7) -> bf16 (s e8 m7, bias 127):
      u16 = ((b << 4) & 0x7F0) + ((127 - 7) << 7) | sign(b) << 15

    The result rows come out EVENS-THEN-ODDS along the sequence-block axis:
    out row r < bk/2 is source row 2r; r >= bk/2 is source row 2(r-bk/2)+1.
    Callers must permute per-position masks/scales to match (`_perm_cols`,
    `_permute_scale_lanes`).

    x: [..., bk, D] fp8 -> [..., bk, D] bf16 (rows permuted as above).
    """
    ev, od = _packed_e4m3_halves(x)
    return jnp.concatenate([ev, od], axis=-2) * E4M3_FIX


# The packed decode below skips the exponent-rebias add (+120 << 7 per
# 16-bit lane): the raw bit pattern, read as bf16, is the true value times
# 2^-120 exactly (e4m3 bias 7 vs bf16 bias 127), and the 2^120 correction
# folds into multiplies the kernel performs anyway — the scalar softmax
# scale on the QK^T side and the accumulator update on the PV side — so
# the add's 2 VPU ops per i32 word vanish from the hot loop.
E4M3_FIX = 2.0 ** 120
# V-side rebias half: p is inflated by 2^60 inside the exp (see
# _decode_kernel_bhsd) so PV products sit 2^-60 below true scale — above
# the fp32 denormal flush — and _finalize repays the full 2^120.
P_SHIFT_LN2 = 60.0 * 0.6931471805599453
P_SHIFT2 = 60.0  # same shift in base-2 units (clamped-softmax mode)
LOG2E = 1.4426950408889634

# Clamped-softmax score ceilings, base-2 units (see FlashConfig.softmax_mode
# in ops/flash_fwd.py for the contract discussion).  Decode with packed fp8
# carries the extra 2^60 p-inflation, so its ceiling is lower to keep
# acc * E4M3_FIX at finalize inside fp32 (l <= 2^(C+73), acc*FIX <=
# 2^(C+81)); both admit natural-units attention logits far beyond any sane
# model's (55 / 27 nats).
CLAMP2_DEC = 80.0
CLAMP2_DEC_FP8 = 40.0


def _packed_e4m3_halves(x):
    """As _packed_e4m3_to_bf16 but returns the (evens, odds) half-planes
    [..., bk//2, D] separately, so callers can run two half-GEMMs and skip
    the [bk, D] concat copy entirely (the concat is ~30% of the decode's
    VPU budget at the 8B shape).

    Returned values are the true values times 2^-120 (see E4M3_FIX): the
    caller owns the rebias.  At ~2.25 int-ops/element (9 ops per i32 word:
    even = shift, mask, or + sign mask+shift; odd = shift, mask, or + sign
    mask — odd sign bits are already in their final lane positions).
    Denormals (e==0) land in the bf16 denormal range and flush to exact 0
    in the MXU — better than the previous biased decode's ~2^-7 artifact.
    """
    w = pltpu.bitcast(x, jnp.int32)  # [..., bk//4, D]
    even = ((w << 4) & 0x07F007F0) | ((w & 0x00800080) << 8)
    odd = ((w >> 4) & 0x07F007F0) | (w & -2147450880)
    ev = pltpu.bitcast(even, jnp.bfloat16)  # [..., bk//2, D]
    od = pltpu.bitcast(odd, jnp.bfloat16)
    return ev, od


def _perm_cols(r, block_k):
    """Source column offset for packed-decode output row r (evens-then-odds)."""
    half = block_k // 2
    return jnp.where(r < half, 2 * r, 2 * (r - half) + 1)


def _permute_scale_lanes(s, block_k):
    """Pre-permute per-position scales [..., S] to the packed-decode row
    order within each block_k chunk: evens of the chunk, then odds."""
    lead = s.shape[:-1]
    S = s.shape[-1]
    r = s.reshape(*lead, S // block_k, block_k // 2, 2)
    r = jnp.swapaxes(r, -1, -2)
    return r.reshape(*lead, S)


def _depermute_scale_lanes(s, block_k):
    """Inverse of _permute_scale_lanes: evens-then-odds chunks back to the
    natural interleaved position order."""
    lead = s.shape[:-1]
    S = s.shape[-1]
    r = s.reshape(*lead, S // block_k, 2, block_k // 2)
    r = jnp.swapaxes(r, -1, -2)
    return r.reshape(*lead, S)


def _check_scale_layout(scale_layout, kv_layout, k_scale, v_scale):
    if scale_layout not in ("kv", "lanes"):
        raise ValueError(f"unknown scale_layout {scale_layout!r}")
    if (
        scale_layout == "lanes"
        and kv_layout != "bhsd"
        and (k_scale is not None or v_scale is not None)
    ):
        raise ValueError("scale_layout='lanes' requires kv_layout='bhsd'")


def _lanes_to_kv(s, perm_chunk):
    """Lane-dense [B, Hk, 1, S] scales back to the broadcastable-to-k
    [B, Hk, S, 1] layout (oracle / non-kernel paths)."""
    if s is None:
        return None
    if perm_chunk:
        s = _depermute_scale_lanes(s, perm_chunk)
    return jnp.swapaxes(s, 2, 3)


def _default_block_k(kv_dtype) -> int:
    """Measured per-mode defaults (v5e, 8B decode shape, same-session sweep):
    1-byte KV wants wide 2048 blocks — fewer grid steps amortize per-block
    work (fp8 0.88 vs 0.83 roofline at 1024; int8 0.95 vs 0.84 at 512) —
    while 2-byte KV peaks at 512 (0.95; a 2048 bf16 block pair blows the
    16 MB VMEM scoped limit and 1024 measures 0.86).  A shipped autotune
    entry for the current chip (utils/autotune_table.json, key
    ``dec:<dtype>``) overrides the static value."""
    from flash_attn_tpu.utils.autotune import get_decode_block_k

    tuned = get_decode_block_k(kv_dtype)
    if tuned is not None:
        return tuned
    return 2048 if kv_dtype.itemsize == 1 else 512


def _default_softmax_mode(kv_dtype, logit_softcap=None) -> str:
    """Measured per-mode defaults (v5e, 8B/8k decode shape, tune_r2s):
    fp8 KV is stats-bound — clamped mode (no running max) lifts it from
    0.73 to 1.01 of the HBM roofline at block_k=2048 — while int8 measured
    *better* online (0.83 vs 0.80; its half-GEMM packed path hides the
    stats pass differently).  Clamped is exact for natural-units logits
    below 27 with fp8 KV (see FlashConfig.softmax_mode contract), which
    every sane model satisfies UNLESS it declares a higher logit bound:
    a softcap cap C means post-softcap logits legitimately reach C nats
    (Gemma-2 uses C=50 > 27.7), so when ``logit_softcap`` exceeds the fp8
    clamped ceiling the default falls back to online rather than silently
    saturating scores in (27.7, C].  Pass softmax_mode explicitly to
    override either way."""
    fp8 = jnp.issubdtype(kv_dtype, jnp.floating) and kv_dtype.itemsize == 1
    if not fp8:
        return "online"
    if logit_softcap is not None and logit_softcap * LOG2E >= CLAMP2_DEC_FP8:
        return "online"
    return "clamped"


def flash_decode(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_length: jax.Array | None = None,
    scale: float | None = None,
    num_splits: int = 1,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
    block_k: int | None = None,
    return_lse: bool = False,
    kv_layout: str = "bshd",
    softmax_mode: str | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    scale_layout: str = "kv",
    scales_perm_chunk: int | None = None,
):
    """Single-token decode attention over a (possibly quantized) KV cache.

    Args:
      q: [B, H, D] — one query token per sequence.
      k, v: KV cache — [B, S, Hk, D] (kv_layout='bshd', reference layout) or
        [B, Hk, S, D] (kv_layout='bhsd', the decode-optimal layout: blocks
        reach the MXU with no in-kernel transpose); any float dtype, or
        int8/fp8 with k_scale/v_scale for fused dequant (scales shaped like
        k/v with trailing dim 1).
      kv_length: [B] int32 — number of valid cache entries per sequence
        (positions >= kv_length are masked).  None = all S valid.
      num_splits: split-KV parallelism ≙ flash_attn.h:94.
      k_scale, v_scale: dequant scales, broadcastable to [B, S, Hk, D]
        (per-head or per-block granularity).
      window: sliding-window (local) attention — attend only to the last
        ``window`` positions of the cache (Mistral-style).  Blocks entirely
        below the window skip their DMA via the clamped index maps, so a
        windowed decode over a long cache streams only ~window bytes.
      softmax_mode: "online" or "clamped" — clamped drops the running max
        entirely (p = 2^min(s2, 80), base-2 scores; fp8 ceiling 40).  Exact
        for natural-units attention logits below 55 (27 with fp8 KV) — see
        FlashConfig.softmax_mode for the contract.  None (default) resolves
        per KV dtype: clamped for fp8 caches (measured 1.01 vs 0.73 of
        roofline), online otherwise.  Honored on the BHSD kernel path (the
        perf path); the BSHD/oracle paths always run online softmax.
      scale_layout: "kv" (default) — scales shaped like k/v with trailing
        dim 1 ([B, S, Hk, 1] / [B, Hk, S, 1] per kv_layout); or "lanes" —
        the kernel-native lane-dense [B, Hk, 1, S] fp32 layout the KVCache
        stores (zero per-step reshapes on the hot path; bhsd only).
      scales_perm_chunk: lane-dense scales are stored pre-permuted to the
        packed-fp8 decode's evens-then-odds row order in chunks of this
        size (engine caches use ops.kv_append.PACKED_CHUNK); None =
        natural position order.  When it matches the resolved block_k the
        hot path does zero per-step scale shuffles.

    Returns out [B, H, D] in q.dtype; with return_lse also lse [B, H] fp32
    (the merge residual for sharded/distributed decode, flash_attn.h:16).
    """
    if jnp.float16 in (q.dtype, k.dtype):
        # fp16 computes as bf16 (no f16 in Mosaic; see flash_fwd)
        cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float16 else x
        res = flash_decode(
            cast(q), cast(k), cast(v), kv_length=kv_length, scale=scale,
            num_splits=num_splits, k_scale=k_scale, v_scale=v_scale,
            interpret=interpret, use_kernel=use_kernel, block_k=block_k,
            return_lse=return_lse, kv_layout=kv_layout,
            softmax_mode=softmax_mode, window=window,
            logit_softcap=logit_softcap, scale_layout=scale_layout,
            scales_perm_chunk=scales_perm_chunk,
        )
        if q.dtype != jnp.float16:
            return res
        if return_lse:
            return res[0].astype(jnp.float16), res[1]
        return res.astype(jnp.float16)

    batch, num_heads, head_dim = q.shape
    if kv_layout == "bhsd":
        seqlen_k = k.shape[2]
        num_heads_k = k.shape[1]
    else:
        seqlen_k = k.shape[1]
        num_heads_k = k.shape[2]
    if scale is None:
        scale = head_dim**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_k is None:
        block_k = _default_block_k(k.dtype)
    if softmax_mode is None:
        softmax_mode = _default_softmax_mode(k.dtype, logit_softcap)
    if kv_length is None:
        kv_length = jnp.full((batch,), seqlen_k, jnp.int32)

    if softmax_mode not in ("online", "clamped"):
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}")
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    _check_scale_layout(scale_layout, kv_layout, k_scale, v_scale)
    if use_kernel and kv_layout == "bhsd":
        return _decode_kernel_call_bhsd(
            q, k, v, kv_length, scale=scale, k_scale=k_scale, v_scale=v_scale,
            block_k=block_k, interpret=interpret, return_lse=return_lse,
            num_splits=num_splits, softmax_mode=softmax_mode, window=window,
            logit_softcap=logit_softcap, scale_layout=scale_layout,
            scales_perm_chunk=scales_perm_chunk,
        )
    if scale_layout == "lanes":
        k_scale = _lanes_to_kv(k_scale, scales_perm_chunk)
        v_scale = _lanes_to_kv(v_scale, scales_perm_chunk)
    if kv_layout == "bhsd":
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        k_scale = None if k_scale is None else jnp.swapaxes(k_scale, 1, 2)
        v_scale = None if v_scale is None else jnp.swapaxes(v_scale, 1, 2)
    if use_kernel and window is None and logit_softcap is None:
        return _decode_kernel_call(
            q, k, v, kv_length, scale=scale, k_scale=k_scale, v_scale=v_scale,
            block_k=block_k, interpret=interpret, return_lse=return_lse,
        )
    # jnp oracle (also the window/softcap path for the legacy BSHD layout)
    return _decode_jnp(
        q, k, v, kv_length, scale=scale, num_splits=num_splits,
        k_scale=k_scale, v_scale=v_scale, return_lse=return_lse,
        window=window, logit_softcap=logit_softcap,
    )


def flash_decode_chunk(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_length: jax.Array,
    scale: float | None = None,
    num_splits: int = 1,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
    block_k: int | None = None,
    return_lse: bool = False,
    kv_layout: str = "bhsd",
    softmax_mode: str | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    scale_layout: str = "kv",
    scales_perm_chunk: int | None = None,
):
    """Multi-token ("chunk") decode: T new tokens per sequence against a
    (possibly quantized) KV cache, causal within the chunk.  This is the
    speculative-decoding verify step and the medusa/jacobi multi-query
    decode primitive.

    Args:
      q: [B, T, H, D] — T new query tokens per sequence.  The cache must
        already hold the chunk's own KV at positions kv_length-T ..
        kv_length-1 (append first, then score — the decode_step
        convention).
      kv_length: [B] int32, INCLUDING the chunk's T tokens; chunk token t
        attends to positions < kv_length - T + 1 + t.

    TPU-native design: the T*H query rows ride the decode kernel's head
    axis as "virtual heads" (a host-side [B,T,Hk,g,D] -> [B, Hk*(T*g), D]
    reorder keeps the GQA block mapping intact), plus a per-row causal
    column limit in place of the scalar one.  The whole verify step reads
    the cache ONCE — K drafts cost one cache sweep instead of K — and the
    fused int8/fp8 dequant path is identical to single-token decode.

    Returns out [B, T, H, D] (q.dtype); with return_lse also lse [B, T, H].
    """
    if jnp.float16 in (q.dtype, k.dtype):
        # fp16 computes as bf16 (no f16 in Mosaic; see flash_fwd)
        cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float16 else x
        res = flash_decode_chunk(
            cast(q), cast(k), cast(v), kv_length=kv_length, scale=scale,
            num_splits=num_splits, k_scale=k_scale, v_scale=v_scale,
            interpret=interpret, use_kernel=use_kernel, block_k=block_k,
            return_lse=return_lse, kv_layout=kv_layout,
            softmax_mode=softmax_mode, window=window,
            logit_softcap=logit_softcap, scale_layout=scale_layout,
            scales_perm_chunk=scales_perm_chunk,
        )
        if q.dtype != jnp.float16:
            return res
        if return_lse:
            return res[0].astype(jnp.float16), res[1]
        return res.astype(jnp.float16)

    batch, chunk, num_heads, head_dim = q.shape
    if kv_layout == "bhsd":
        num_heads_k = k.shape[1]
    else:
        num_heads_k = k.shape[2]
    group = num_heads // num_heads_k
    if scale is None:
        scale = head_dim**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_k is None:
        block_k = _default_block_k(k.dtype)
    if softmax_mode is None:
        softmax_mode = _default_softmax_mode(k.dtype, logit_softcap)
    _check_scale_layout(scale_layout, kv_layout, k_scale, v_scale)

    if use_kernel and kv_layout == "bhsd":
        # (hk, t, g)-major virtual-head order so each kv head's rows stay
        # contiguous: the kernel's [Hk, group', D] reshape then needs no
        # in-kernel transpose.
        q2 = (
            q.reshape(batch, chunk, num_heads_k, group, head_dim)
            .transpose(0, 2, 1, 3, 4)
            .reshape(batch, num_heads_k * chunk * group, head_dim)
        )
        res = _decode_kernel_call_bhsd(
            q2, k, v, jnp.asarray(kv_length, jnp.int32), scale=scale,
            k_scale=k_scale, v_scale=v_scale, block_k=block_k,
            interpret=interpret, return_lse=return_lse,
            num_splits=num_splits, chunk=chunk, softmax_mode=softmax_mode,
            window=window, logit_softcap=logit_softcap,
            scale_layout=scale_layout, scales_perm_chunk=scales_perm_chunk,
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

    if scale_layout == "lanes":
        k_scale = _lanes_to_kv(k_scale, scales_perm_chunk)
        v_scale = _lanes_to_kv(v_scale, scales_perm_chunk)
    if kv_layout == "bhsd":
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        k_scale = None if k_scale is None else jnp.swapaxes(k_scale, 1, 2)
        v_scale = None if v_scale is None else jnp.swapaxes(v_scale, 1, 2)
    return _decode_chunk_jnp(
        q, k, v, jnp.asarray(kv_length, jnp.int32), scale=scale,
        k_scale=k_scale, v_scale=v_scale, return_lse=return_lse,
        window=window, logit_softcap=logit_softcap,
    )


def _decode_chunk_jnp(q, k, v, kv_length, *, scale, k_scale, v_scale,
                      return_lse=False, window=None, logit_softcap=None):
    """jnp oracle for chunk decode: correctness spec for the kernel."""
    batch, chunk, num_heads, head_dim = q.shape
    seqlen_k = k.shape[1]
    group = num_heads // k.shape[2]
    kf = jnp.repeat(_dequant(k, k_scale), group, axis=2)
    vf = jnp.repeat(_dequant(v, v_scale), group, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), kf) * scale
    if logit_softcap is not None:
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    pos = jnp.arange(seqlen_k)
    limit = kv_length[:, None] - chunk + 1 + jnp.arange(chunk)[None]  # [B,T]
    valid = pos[None, None, :] < limit[:, :, None]  # [B, T, S]
    if window is not None:
        valid &= pos[None, None, :] >= (limit - window)[:, :, None]
    s = jnp.where(valid[:, None], s, float("-inf"))
    m = jnp.max(s, axis=-1, keepdims=True)
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - safe_m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p, vf)
    o = o / jnp.maximum(jnp.swapaxes(l, 1, 2), 1e-37)
    if return_lse:
        lse = jnp.where(
            l[..., 0] > 0,
            safe_m[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-37)),
            float("-inf"),
        )
        return o.astype(q.dtype), jnp.swapaxes(lse, 1, 2)
    return o.astype(q.dtype)


def _dequant(x, x_scale):
    xf = x.astype(jnp.float32)
    if x_scale is not None:
        xf = xf * jnp.broadcast_to(x_scale, x.shape).astype(jnp.float32)
    return xf


def _decode_jnp(q, k, v, kv_length, *, scale, num_splits, k_scale, v_scale,
                logit_softcap=None,
                return_lse=False, window=None):
    """jnp oracle for split-KV decode: correctness spec for the kernel."""
    batch, num_heads, head_dim = q.shape
    seqlen_k = k.shape[1]
    num_heads_k = k.shape[2]
    group = num_heads // num_heads_k

    kf = _dequant(k, k_scale)
    vf = _dequant(v, v_scale)
    kf = jnp.repeat(kf, group, axis=2)
    vf = jnp.repeat(vf, group, axis=2)
    qf = q.astype(jnp.float32)

    split = -(-seqlen_k // num_splits)
    outs, lses = [], []
    for i in range(num_splits):
        lo = i * split
        hi = min(lo + split, seqlen_k)
        if lo >= seqlen_k:
            break
        s = jnp.einsum("bhd,bkhd->bhk", qf, kf[:, lo:hi]) * scale
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s / logit_softcap)
        pos = jnp.arange(lo, hi)
        valid = pos[None, None, :] < kv_length[:, None, None]
        if window is not None:
            valid &= pos[None, None, :] >= (kv_length - window)[:, None, None]
        s = jnp.where(valid, s, float("-inf"))
        m = jnp.max(s, axis=-1, keepdims=True)
        safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - safe_m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhk,bkhd->bhd", p, vf[:, lo:hi])
        o = jnp.where(l > 0, o / jnp.maximum(l, 1e-37), 0.0)
        lse = jnp.where(l[..., 0] > 0, safe_m[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-37)), float("-inf"))
        outs.append(o)
        lses.append(lse)
    out, lse = lse_merge(jnp.stack(outs), jnp.stack(lses), axis=0)
    if return_lse:
        return out.astype(q.dtype), lse
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas decode kernel: grid (batch, kv_block); all heads of one sequence are
# processed together so the MXU sees [H, D] x [D, bk] GEMMs even at batch 1.
# ---------------------------------------------------------------------------


def _decode_kernel(
    kvlen_ref,  # scalar prefetch [B]
    q_ref,      # [1, H, D]
    k_ref,      # [1, bk, Hk, D]
    v_ref,      # [1, bk, Hk, D]
    ks_ref,     # [1, bk, Hk, 1] scales (or dummy)
    vs_ref,
    o_ref,      # [1, H, D]
    lse_ref,    # [1, H, 1]
    m_scratch,  # [H, 128]
    l_scratch,  # [H, 128]
    acc_scratch,  # [H, D]
    *,
    block_k: int,
    num_k_blocks: int,
    num_heads: int,
    num_heads_k: int,
    scale: float,
    has_k_scale: bool,
    has_v_scale: bool,
    out_dtype,
):
    b, ki = pl.program_id(0), pl.program_id(1)
    group = num_heads // num_heads_k

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kvlen_ref[b]

    # MXU compute dtype: bf16 path for bf16/fp16/int8/fp8 inputs (int8->bf16
    # casts are exact for |x| <= 127); fp32 stays fp32 (HIGHEST precision).
    compute_dtype = (
        jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    )

    @pl.when(ki * block_k < kv_len)
    def _body():
        # Per-(token, head) dequant scales are FOLDED OUT of the matmuls:
        #   s_hj = softmax_scale * ks_j * (q_h . k_int_j)
        #   out  = sum_j (p_hj * vs_j) * v_int_j
        # so the MXU sees narrow operands, and dequant is O(H*bk) VPU work
        # on scores instead of O(bk*Hk*D) on the cache block.
        q = q_ref[0].astype(compute_dtype)  # [H, D]
        k = k_ref[0].astype(compute_dtype)  # [bk, Hk, D] (no scale applied)
        qg = q.reshape(num_heads_k, group, q.shape[-1])  # [Hk, g, D]
        s = sdot(
            qg, jnp.swapaxes(k, 0, 1),  # [Hk, g, D] x [Hk, bk, D]
            (((2,), (2,)), ((0,), (0,))),
        )  # [Hk, g, bk] fp32
        if has_k_scale:
            ks_t = jnp.swapaxes(ks_ref[0, :, :, 0], 0, 1)  # [Hk, bk]
            s = s * ks_t[:, None, :].astype(jnp.float32)
        s = s.reshape(num_heads, block_k) * scale

        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, block_k), 1
        )
        mask = col < kv_len
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # [H, bk] fp32
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        # Narrow [:, :1] stat writes, not 128-lane broadcasts (same finding
        # as the fwd kernel: ~+4% — the broadcast is a full-tile store).
        m_scratch[:, :1] = m_new
        l_scratch[:, :1] = l_new

        v = v_ref[0].astype(compute_dtype)  # [bk, Hk, D] (no scale applied)
        pg = p.reshape(num_heads_k, group, block_k)
        if has_v_scale:
            vs_t = jnp.swapaxes(vs_ref[0, :, :, 0], 0, 1)  # [Hk, bk]
            pg = pg * vs_t[:, None, :].astype(jnp.float32)
        o = sdot(
            pg.astype(compute_dtype), jnp.swapaxes(v, 0, 1),
            (((2,), (1,)), ((0,), (0,))),
        )  # [Hk, g, D] fp32
        o = o.reshape(num_heads, v.shape[-1])
        acc_scratch[...] = acc_scratch[...] * alpha + o

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        m = m_scratch[:, :1]
        l = l_scratch[:, :1]
        valid = l > 0.0
        o_ref[0] = jnp.where(
            valid, acc_scratch[...] / jnp.where(valid, l, 1.0), 0.0
        ).astype(out_dtype)
        lse_ref[0] = jnp.where(
            valid, m + jnp.log(jnp.where(valid, l, 1.0)), NEG_INF
        ).astype(jnp.float32)


def _decode_kernel_call(q, k, v, kv_length, *, scale, k_scale, v_scale,
                        block_k, interpret, return_lse=False):
    batch, num_heads, head_dim = q.shape
    _, seqlen_k, num_heads_k, _ = k.shape

    block_k = min(block_k, max(-(-seqlen_k // 128) * 128, 128))
    sk_p = -(-seqlen_k // block_k) * block_k
    if sk_p != seqlen_k:
        pads = ((0, 0), (0, sk_p - seqlen_k), (0, 0), (0, 0))
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
    num_k_blocks = sk_p // block_k

    has_ks = k_scale is not None
    has_vs = v_scale is not None

    def scales_arg(s):
        if s is None:
            return jnp.zeros((1, 1, num_heads_k, 1), jnp.float32)
        s = jnp.broadcast_to(s, (batch, seqlen_k, num_heads_k, 1)).astype(jnp.float32)
        return jnp.pad(s, ((0, 0), (0, sk_p - seqlen_k), (0, 0), (0, 0)))

    ks = scales_arg(k_scale)
    vs = scales_arg(v_scale)

    kv_spec = pl.BlockSpec((1, block_k, num_heads_k, head_dim), lambda b, ki, *_: (b, ki, 0, 0))
    def scale_spec(has):
        if has:
            return pl.BlockSpec((1, block_k, num_heads_k, 1), lambda b, ki, *_: (b, ki, 0, 0))
        return pl.BlockSpec((1, 1, num_heads_k, 1), lambda b, ki, *_: (0, 0, 0, 0))

    kernel = functools.partial(
        _decode_kernel,
        block_k=block_k,
        num_k_blocks=num_k_blocks,
        num_heads=num_heads,
        num_heads_k=num_heads_k,
        scale=float(scale),
        has_k_scale=has_ks,
        has_v_scale=has_vs,
        out_dtype=q.dtype,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, num_k_blocks),
            in_specs=[
                pl.BlockSpec((1, num_heads, head_dim), lambda b, ki, *_: (b, 0, 0)),
                kv_spec,
                kv_spec,
                scale_spec(has_ks),
                scale_spec(has_vs),
            ],
            out_specs=[
                pl.BlockSpec((1, num_heads, head_dim), lambda b, ki, *_: (b, 0, 0)),
                pl.BlockSpec((1, num_heads, 1), lambda b, ki, *_: (b, 0, 0)),
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
            flops=4 * batch * num_heads * seqlen_k * head_dim,
            bytes_accessed=int(k.size * k.dtype.itemsize * 2),
            transcendentals=batch * num_heads * seqlen_k,
        ),
        interpret=interpret,
    )(kv_length.astype(jnp.int32), q, k, v, ks, vs)
    if return_lse:
        return out, lse[..., 0]
    return out


# ---------------------------------------------------------------------------
# BHSD-native decode: cache stored [B, Hk, S, D] so every block reaches the
# MXU with zero in-kernel transposes (the BSHD kernel's per-step
# [bk,Hk,D]->[Hk,bk,D] shuffle crosses the (8,128) tiling and dominates at
# long context).  This is the layout the engine's KV cache uses.
# ---------------------------------------------------------------------------


# Ablation switches (read at trace time; benchmarks/tune_r2h.py flips them):
# _DMA_CLAMP gates the kv_len-based dead-block DMA skip; _SPLIT_BODY gates
# the maskless fast body for fully-valid blocks.
_DMA_CLAMP = True
_SPLIT_BODY = True


def _decode_kernel_bhsd(
    kvlen_ref,  # scalar prefetch [B]
    kvclamp_ref,  # scalar prefetch [2, B]: last/first live block (host-side)
    q_ref,      # [1, H, D]
    k_ref,      # [1, Hk, bk, D]
    v_ref,      # [1, Hk, bk, D]
    ks_ref,     # [1, Hk, 1, bk] (lane-dense scales; or dummy)
    vs_ref,
    o_ref,      # [1, H, D] (split: [1, 1, H, D])
    lse_ref,    # [1, H, 1] (split: [1, 1, H, 1])
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    block_k: int,
    blocks_per_split: int,
    num_heads: int,
    num_heads_k: int,
    scale: float,
    has_k_scale: bool,
    has_v_scale: bool,
    packed_fp8: bool,
    has_split_dim: bool,
    chunk: int,
    out_dtype,
    clamped: bool = False,
    window: int | None = None,
    softcap: float | None = None,
):
    # Default grid (batch, k_block).  With num_splits > 1 the grid grows a
    # middle split axis ≙ the reference's num_splits (flash_attn.h:94) —
    # each split owns a contiguous run of k blocks and emits an independent
    # (out, lse) partial, merged outside via lse_merge.  The axis is only
    # materialized when requested: the extra grid dim + index arithmetic
    # costs ~15% on the hot num_splits=1 path (measured, r2h).
    if has_split_dim:
        b, sp, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        ki_global = sp * blocks_per_split + ki
    else:
        b, ki = pl.program_id(0), pl.program_id(1)
        ki_global = ki
    group = num_heads // num_heads_k

    @pl.when(ki == 0)
    def _init():
        if not clamped:  # m never read in clamped mode
            m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kvlen_ref[b]
    compute_dtype = (
        jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    )
    if clamped:
        # Scores arrive in base-2 units (LOG2E folded into the q pre-scale).
        clamp2 = CLAMP2_DEC_FP8 if packed_fp8 else CLAMP2_DEC

    def _body(need_mask):
        q = q_ref[0].astype(compute_dtype)  # [H, D]
        # Fold the scalar softmax scale into q here, in-kernel: a [H, D]
        # (4K-elem) multiply per step instead of the [H, bk] (65K-elem)
        # multiply on the scores.  (Folding it on the HOST lost 15-40
        # us/call — the per-call jnp work on [B,Hk,S] scale arrays is not
        # hoisted out of decode loops; r2j measurement.  In-kernel q-side
        # folding has neither cost.)  With packed fp8, K's 2^120 rebias
        # (see E4M3_FIX) rides the same multiply for free.
        q = q * jnp.asarray(
            scale
            * (E4M3_FIX if packed_fp8 else 1.0)
            * (LOG2E if clamped else 1.0),
            compute_dtype,
        )
        qg = q.reshape(num_heads_k, group, q.shape[-1])  # [Hk, g, D]
        if packed_fp8:
            # two half-GEMMs on the decoded (evens, odds) planes; scores
            # concat along bk (16K elems) replaces the [bk, D] KV concat
            # (512K elems) — the decode's biggest VPU saving.
            k_ev, k_od = _packed_e4m3_halves(k_ref[0])  # [Hk, bk/2, D] x2
            s_ev = sdot(qg, k_ev, (((2,), (2,)), ((0,), (0,))))
            s_od = sdot(qg, k_od, (((2,), (2,)), ((0,), (0,))))
            s = jnp.concatenate([s_ev, s_od], axis=-1)  # [Hk, g, bk]
        else:
            k = _fast_cast(k_ref[0], compute_dtype)  # [Hk, bk, D]
            s = sdot(qg, k, (((2,), (2,)), ((0,), (0,))))  # [Hk, g, bk] fp32
        if has_k_scale:
            s = s * ks_ref[0][:, :, :].astype(jnp.float32)  # [Hk, 1, bk]
        s = s.reshape(num_heads, block_k)
        if softcap is not None:
            # Gemma-2-style cap on the TRUE scaled scores (post k_scale /
            # fp8-rebias cancellation); base-2 modes pre-scale the cap.
            s = softcap * jnp.tanh(s / softcap)

        if need_mask:
            r = jax.lax.broadcasted_iota(jnp.int32, (num_heads, block_k), 1)
            if packed_fp8:
                r = _perm_cols(r, block_k)  # scores follow packed row order
            col = ki_global * block_k + r
            if chunk > 1:
                # Chunk decode (flash_decode_chunk): rows are virtual heads
                # in (hk, t, g) order; chunk token t attends to positions
                # < kv_len - chunk + 1 + t.  One [rows, 1] iota replaces
                # the scalar limit — same per-element compare count.
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (num_heads, 1), 0
                )
                t = (row % group) // (group // chunk)
                limit = kv_len - (chunk - 1) + t
            else:
                limit = kv_len
            keep = col < limit
            if window is not None:
                # sliding-window decode (Mistral-style local attention):
                # each (virtual-head) row attends to the last `window`
                # positions below its causal limit
                keep &= col >= limit - window
            s = jnp.where(keep, s, NEG_INF)

        l_prev = l_scratch[:, :1]
        if clamped:
            # No running max (softmax_mode="clamped", same contract as the
            # fwd kernel's mode): a clamp min replaces the [H, bk]
            # max-reduce + m-subtract, and the accumulator needs no alpha
            # rescale.  With packed fp8 the 2^60 p-inflation (see the
            # online branch below) becomes a [H, bk] add on the clamped
            # scores — still cheaper than the reduce it replaces.
            sc = jnp.minimum(s, clamp2)
            if packed_fp8:
                sc = sc + P_SHIFT2
            p = jax.lax.exp2(sc)  # masked NEG_INF cols exp2 to exactly 0
            alpha = None
        else:
            m_prev = m_scratch[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            if packed_fp8:
                # V's 2^120 rebias (E4M3_FIX), half 1: inflate p by 2^60 by
                # folding 60*ln2 into the max-shift (a [H, 1] op — free).
                # The PV products are then p_true*v_true*2^-60, far above
                # the fp32 denormal flush (a plain post-GEMM 2^120 multiply
                # would flush every product with p*|v| < 2^-6 — catastrophic
                # for diffuse attention).  l inflates by 2^60 consistently
                # across steps; _finalize pays it back.  p stays <= 2^60 and
                # l <= bk*2^60, both comfortably inside fp32.
                p = jnp.exp(s - (m_new - P_SHIFT_LN2))
            else:
                p = jnp.exp(s - m_new)  # [H, bk]; masked cols underflow to 0
            # Narrow [:, :1] stat writes, not 128-lane broadcasts (same
            # finding as the fwd kernel: ~+4% — the broadcast is a full-tile
            # store).
            m_scratch[:, :1] = m_new
        l_new = (
            l_prev + jnp.sum(p, axis=1, keepdims=True)
            if clamped
            else l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        )
        l_scratch[:, :1] = l_new

        pg = p.reshape(num_heads_k, group, block_k)
        if has_v_scale:
            pg = pg * vs_ref[0][:, :, :].astype(jnp.float32)  # [Hk, 1, bk]
        if packed_fp8:
            v_ev, v_od = _packed_e4m3_halves(v_ref[0])  # [Hk, bk/2, D] x2
            half = block_k // 2
            pc = pg.astype(compute_dtype)
            o = sdot(pc[:, :, :half], v_ev, (((2,), (1,)), ((0,), (0,))))
            o = o + sdot(pc[:, :, half:], v_od, (((2,), (1,)), ((0,), (0,))))
            d_out = v_ev.shape[-1]
        else:
            v = _fast_cast(v_ref[0], compute_dtype)  # [Hk, bk, D]
            o = sdot(pg.astype(compute_dtype), v, (((2,), (1,)), ((0,), (0,))))
            d_out = v.shape[-1]
        if clamped:
            acc_scratch[...] = acc_scratch[...] + o.reshape(num_heads, d_out)
        else:
            acc_scratch[...] = acc_scratch[...] * alpha + o.reshape(
                num_heads, d_out
            )

    # Mask generation (iota + packed-row permute + compare + select over
    # [H, bk]) is only needed on the block straddling kv_len; fully-valid
    # blocks — the common case decoding near a full cache — take the
    # maskless body.  Top-level pl.when regions are skipped cheaply.
    live = ki_global * block_k < kv_len
    if window is not None:
        # block intersects the LOOSEST row window (t=0's lower bound)
        live &= (ki_global + 1) * block_k > kv_len - (chunk - 1) - window
    if _SPLIT_BODY:
        # A block is maskless only if valid for the STRICTEST chunk row
        # (t=0, limit kv_len - chunk + 1); rows up to kv_len keep it live.
        full = (ki_global + 1) * block_k <= kv_len - (chunk - 1)
        if window is not None:
            # ... and above the strictest lower bound (t=chunk-1's window)
            full &= ki_global * block_k >= kv_len - window
        pl.when(live & full)(lambda: _body(False))
        pl.when(live & ~full)(lambda: _body(True))
    else:
        pl.when(live)(lambda: _body(True))

    @pl.when(ki == blocks_per_split - 1)
    def _finalize():
        l = l_scratch[:, :1]
        if clamped:
            # No m stat: an all-masked row has l == 0 exactly (NEG_INF
            # scores exp2 to 0 with no underflowing subtraction involved).
            valid = l > 0.0
        else:
            m = m_scratch[:, :1]
            valid = (l > 0.0) & (m > NEG_INF / 2)
        acc = acc_scratch[...]
        if packed_fp8:
            # Pay back V's rebias: acc holds out_true * l_true * 2^-60 and
            # l holds l_true * 2^60, so acc/l is out_true * 2^-120 — which
            # would flush small outputs to fp32 denormals.  Re-inflate acc
            # FIRST (acc stays < 2^90 for any e4m3 input), then divide.
            acc = acc * E4M3_FIX
        out = jnp.where(
            valid, acc / jnp.where(valid, l, 1.0), 0.0
        ).astype(out_dtype)
        # Clamped mode: l = sum(2^{s2}) = sum(e^{s_nat}) (times 2^60 under
        # packed fp8), so log(l) IS the natural-units lse with no m term.
        lse_raw = jnp.log(jnp.where(valid, l, 1.0))
        if not clamped:
            lse_raw = m + lse_raw
        if packed_fp8:
            lse_raw = lse_raw - P_SHIFT_LN2  # log of the 2^60 p inflation
        lse = jnp.where(valid, lse_raw, NEG_INF).astype(jnp.float32)
        if has_split_dim:
            o_ref[0, 0] = out
            lse_ref[0, 0] = lse
        else:
            o_ref[0] = out
            lse_ref[0] = lse


def _decode_kernel_call_bhsd(q, k, v, kv_length, *, scale, k_scale, v_scale,
                             block_k, interpret, return_lse=False,
                             num_splits=1, chunk=1, softmax_mode="online",
                             window=None, logit_softcap=None,
                             scale_layout="kv", scales_perm_chunk=None):
    batch, num_heads, head_dim = q.shape
    _, num_heads_k, seqlen_k, _ = k.shape

    if num_heads == num_heads_k and head_dim < 128 and chunk == 1:
        # MHA (group=1) with head_dim < 128: Mosaic cannot lower the
        # [Hk, 1, D] batched QK dot (probed: g=1 D=64 fails both as a
        # reshape+dot and as 2-D dots with an empty non-contracting set,
        # while g>=4 at D=64 and g=1 at D=128 lower fine).  Ride the GQA
        # path with a replicated fake group of 8: q is KB-sized next to
        # the KV stream and the MXU is idle in decode, so the 8x
        # replication is noise; rows are identical and row 0 is returned.
        # (rep=4 was probed on real Mosaic and FAILS the same shape-cast
        # at [Hk, 4, 64] — 8 is the smallest group that lowers here.)
        rep = 8
        res = _decode_kernel_call_bhsd(
            jnp.repeat(q, rep, axis=1), k, v, kv_length, scale=scale,
            k_scale=k_scale, v_scale=v_scale, block_k=block_k,
            interpret=interpret, return_lse=return_lse,
            num_splits=num_splits, chunk=chunk, softmax_mode=softmax_mode,
            window=window, logit_softcap=logit_softcap,
            scale_layout=scale_layout, scales_perm_chunk=scales_perm_chunk,
        )
        unrep = lambda x: x.reshape(
            batch, num_heads, rep, *x.shape[2:]
        )[:, :, 0]
        if return_lse:
            return unrep(res[0]), unrep(res[1])
        return unrep(res)

    block_k = min(block_k, max(-(-seqlen_k // 128) * 128, 128))
    num_splits = max(1, min(num_splits, -(-seqlen_k // block_k)))
    # pad S so every split owns the same number of whole blocks
    sk_p = -(-seqlen_k // (block_k * num_splits)) * block_k * num_splits
    if sk_p != seqlen_k:
        pads = ((0, 0), (0, 0), (0, sk_p - seqlen_k), (0, 0))
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
    num_k_blocks = sk_p // block_k
    blocks_per_split = num_k_blocks // num_splits

    has_ks = k_scale is not None
    has_vs = v_scale is not None
    # Packed-pair fp8 decode (see _packed_e4m3_to_bf16): Mosaic-only
    # (pltpu.bitcast width change has no interpret lowering).
    packed_fp8 = (
        k.dtype == jnp.float8_e4m3fn
        and v.dtype == jnp.float8_e4m3fn
        and not interpret
        and block_k % 4 == 0
    )

    def scales_arg(s):
        # lane-dense layout [B, Hk, 1, S]: a [.., 1, bk] block is one dense
        # row of lanes (a [.., bk, 1] block would burn a full (8,128) tile
        # per scale — 128x DMA inflation that dwarfed the int8 KV savings).
        if s is None:
            return jnp.zeros((1, num_heads_k, 1, 1), jnp.float32)
        if scale_layout == "lanes":
            # already kernel-native [B, Hk, 1, S]; the engine's hot path —
            # with the store-order permutation matching the resolved
            # block_k this is a zero-reshape passthrough.
            s = s.astype(jnp.float32)
            if packed_fp8 and scales_perm_chunk == block_k:
                return jnp.pad(
                    s, ((0, 0), (0, 0), (0, 0), (0, sk_p - seqlen_k))
                )
            if scales_perm_chunk:
                # stored order doesn't match this call's block_k: undo the
                # store permutation (pre-pad: stored S is a chunk multiple)
                s = _depermute_scale_lanes(s, scales_perm_chunk)
            s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, sk_p - seqlen_k)))
            if packed_fp8:
                s = _permute_scale_lanes(s, block_k)
            return s
        s = jnp.broadcast_to(s, (batch, num_heads_k, seqlen_k, 1)).astype(jnp.float32)
        s = jnp.swapaxes(s, 2, 3)  # [B, Hk, 1, S]
        s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, sk_p - seqlen_k)))
        if packed_fp8:
            s = _permute_scale_lanes(s, block_k)
        return s

    ks = scales_arg(k_scale)
    vs = scales_arg(v_scale)

    # Host-precomputed first/last useful block index per sequence (avoids a
    # scalar divide in the index map, which runs every grid step).  Row 0 =
    # last live block; row 1 = first live block (0 unless sliding-window).
    kv_last = (jnp.maximum(kv_length.astype(jnp.int32) - 1, 0)
               // block_k).astype(jnp.int32)
    if window is None:
        kv_first = jnp.zeros_like(kv_last)
    else:
        kv_first = (
            jnp.maximum(kv_length.astype(jnp.int32) - (chunk - 1) - window, 0)
            // block_k
        ).astype(jnp.int32)
    kv_clamp = jnp.stack([kv_last, kv_first])  # [2, B]

    has_split_dim = num_splits > 1

    def clamp_ki(ki_global, b, kvclamp_ref):
        # Clamp dead blocks (beyond this sequence's kv_len, or below its
        # sliding window) to the nearest live block index: Pallas sees an
        # unchanged index and skips the DMA, so a partially-filled cache —
        # or a windowed decode over a long cache — streams only live bytes.
        if not _DMA_CLAMP:
            return ki_global
        kg = ki_global
        if window is not None:
            kg = jnp.maximum(kg, kvclamp_ref[1, b])
        return jnp.minimum(kg, kvclamp_ref[0, b])

    if has_split_dim:
        def kv_block(b, sp, ki, kvlen_ref, kvlast_ref):
            kg = sp * blocks_per_split + ki
            return (b, 0, clamp_ki(kg, b, kvlast_ref), 0)

        def s_block(b, sp, ki, kvlen_ref, kvlast_ref):
            kg = sp * blocks_per_split + ki
            return (b, 0, 0, clamp_ki(kg, b, kvlast_ref))

        q_map = lambda b, sp, ki, *_: (b, 0, 0)
        dummy_s_map = lambda b, sp, ki, *_: (0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec(
                (1, 1, num_heads, head_dim),
                lambda b, sp, ki, *_: (b, sp, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, num_heads, 1), lambda b, sp, ki, *_: (b, sp, 0, 0)
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (batch, num_splits, num_heads, head_dim), q.dtype
            ),
            jax.ShapeDtypeStruct(
                (batch, num_splits, num_heads, 1), jnp.float32
            ),
        ]
        grid = (batch, num_splits, blocks_per_split)
        dims = ("parallel", "parallel", "arbitrary")
    else:
        def kv_block(b, ki, kvlen_ref, kvlast_ref):
            return (b, 0, clamp_ki(ki, b, kvlast_ref), 0)

        def s_block(b, ki, kvlen_ref, kvlast_ref):
            return (b, 0, 0, clamp_ki(ki, b, kvlast_ref))

        q_map = lambda b, ki, *_: (b, 0, 0)
        dummy_s_map = lambda b, ki, *_: (0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec(
                (1, num_heads, head_dim), lambda b, ki, *_: (b, 0, 0)
            ),
            pl.BlockSpec((1, num_heads, 1), lambda b, ki, *_: (b, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((batch, num_heads, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, 1), jnp.float32),
        ]
        grid = (batch, blocks_per_split)
        dims = ("parallel", "arbitrary")

    kv_spec = pl.BlockSpec((1, num_heads_k, block_k, head_dim), kv_block)

    def scale_spec(has):
        if has:
            return pl.BlockSpec((1, num_heads_k, 1, block_k), s_block)
        return pl.BlockSpec((1, num_heads_k, 1, 1), dummy_s_map)

    kernel = functools.partial(
        _decode_kernel_bhsd,
        block_k=block_k,
        blocks_per_split=blocks_per_split,
        num_heads=num_heads,
        num_heads_k=num_heads_k,
        scale=float(scale),
        has_k_scale=has_ks,
        has_v_scale=has_vs,
        packed_fp8=packed_fp8,
        has_split_dim=has_split_dim,
        chunk=chunk,
        out_dtype=q.dtype,
        clamped=softmax_mode == "clamped",
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
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, num_heads, head_dim), q_map),
                kv_spec,
                kv_spec,
                scale_spec(has_ks),
                scale_spec(has_vs),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((num_heads, 128), jnp.float32),
                pltpu.VMEM((num_heads, 128), jnp.float32),
                pltpu.VMEM((num_heads, head_dim), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims,
            # Default Mosaic cap rejects >=4 KB/row KV blocks at head_dim
            # 128 (double-buffered K+V tiles alone are 16 MB) — e.g. fp8
            # bk=4096 or bf16 bk=2048.  Raise it ONLY there: raising it
            # unconditionally cost fp8 bk=2048 a measured 193.7 -> 287 us
            # (Mosaic allocates deeper buffering it can't use), and fp8
            # bk=4096 itself measured 0.578 of roofline — an escape hatch,
            # not a default.
            vmem_limit_bytes=(
                100 * 1024 * 1024
                if block_k * k.dtype.itemsize >= 4096 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seqlen_k * head_dim,
            bytes_accessed=int(k.size * k.dtype.itemsize * 2),
            transcendentals=batch * num_heads * seqlen_k,
        ),
        interpret=interpret,
    )(kv_length.astype(jnp.int32), kv_clamp, q, k, v, ks, vs)
    if has_split_dim:
        out, lse = lse_merge(
            jnp.swapaxes(out, 0, 1), jnp.swapaxes(lse[..., 0], 0, 1), axis=0
        )
        out = out.astype(q.dtype)
    else:
        lse = lse[..., 0]
    if return_lse:
        return out, lse
    return out
