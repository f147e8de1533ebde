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
    `_permute_scale_lanes`).  Denormals (e==0) decode to ~2^-7 * scale
    instead of ~0 — a 1.7e-5-of-absmax error, far below e4m3's 6%
    quantization step, so no flush is spent on them.

    x: [..., bk, D] fp8 -> [..., bk, D] bf16 (rows permuted as above).
    """
    ev, od = _packed_e4m3_halves(x)
    return jnp.concatenate([ev, od], axis=-2)


def _packed_e4m3_halves(x):
    """As _packed_e4m3_to_bf16 but returns the (evens, odds) half-planes
    [..., bk//2, D] separately, so callers can run two half-GEMMs and skip
    the [bk, D] concat copy entirely (the concat is ~30% of the decode's
    VPU budget at the 8B shape)."""
    w = pltpu.bitcast(x, jnp.int32)  # [..., bk//4, D]
    even_t = (w & 0x00FF00FF) << 4
    even = ((even_t & 0x07F007F0) + 0x3C003C00) | ((even_t & 0x08000800) << 4)
    odd_t = (w >> 4) & 0x0FF00FF0
    odd = ((odd_t & 0x07F007F0) + 0x3C003C00) | ((odd_t & 0x08000800) << 4)
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
    block_k: int = 512,
    return_lse: bool = False,
    kv_layout: str = "bshd",
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

    Returns out [B, H, D] in q.dtype; with return_lse also lse [B, H] fp32
    (the merge residual for sharded/distributed decode, flash_attn.h:16).
    """
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
    if kv_length is None:
        kv_length = jnp.full((batch,), seqlen_k, jnp.int32)

    if use_kernel and kv_layout == "bhsd":
        return _decode_kernel_call_bhsd(
            q, k, v, kv_length, scale=scale, k_scale=k_scale, v_scale=v_scale,
            block_k=block_k, interpret=interpret, return_lse=return_lse,
        )
    if kv_layout == "bhsd":
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        k_scale = None if k_scale is None else jnp.swapaxes(k_scale, 1, 2)
        v_scale = None if v_scale is None else jnp.swapaxes(v_scale, 1, 2)
    if use_kernel:
        return _decode_kernel_call(
            q, k, v, kv_length, scale=scale, k_scale=k_scale, v_scale=v_scale,
            block_k=block_k, interpret=interpret, return_lse=return_lse,
        )
    return _decode_jnp(
        q, k, v, kv_length, scale=scale, num_splits=num_splits,
        k_scale=k_scale, v_scale=v_scale, return_lse=return_lse,
    )


def _dequant(x, x_scale):
    xf = x.astype(jnp.float32)
    if x_scale is not None:
        xf = xf * jnp.broadcast_to(x_scale, x.shape).astype(jnp.float32)
    return xf


def _decode_jnp(q, k, v, kv_length, *, scale, num_splits, k_scale, v_scale,
                return_lse=False):
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
        pos = jnp.arange(lo, hi)
        valid = pos[None, None, :] < kv_length[:, None, None]
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
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

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


def _decode_kernel_bhsd(
    kvlen_ref,  # scalar prefetch [B]
    q_ref,      # [1, H, D]
    k_ref,      # [1, Hk, bk, D]
    v_ref,      # [1, Hk, bk, D]
    ks_ref,     # [1, Hk, 1, bk] (lane-dense scales; or dummy)
    vs_ref,
    o_ref,      # [1, H, D]
    lse_ref,    # [1, H, 1]
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    block_k: int,
    num_k_blocks: int,
    num_heads: int,
    num_heads_k: int,
    scale: float,
    has_k_scale: bool,
    has_v_scale: bool,
    packed_fp8: bool,
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
    compute_dtype = (
        jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    )

    @pl.when(ki * block_k < kv_len)
    def _body():
        q = q_ref[0].astype(compute_dtype)  # [H, D]
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
        s = s.reshape(num_heads, block_k) * scale

        r = jax.lax.broadcasted_iota(jnp.int32, (num_heads, block_k), 1)
        if packed_fp8:
            r = _perm_cols(r, block_k)  # scores follow the packed row order
        col = ki * block_k + r
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [H, bk]; masked cols underflow to 0
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

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
        acc_scratch[...] = acc_scratch[...] * alpha + o.reshape(
            num_heads, d_out
        )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        m = m_scratch[:, :1]
        l = l_scratch[:, :1]
        valid = (l > 0.0) & (m > NEG_INF / 2)
        o_ref[0] = jnp.where(
            valid, acc_scratch[...] / jnp.where(valid, l, 1.0), 0.0
        ).astype(out_dtype)
        lse_ref[0] = jnp.where(
            valid, m + jnp.log(jnp.where(valid, l, 1.0)), NEG_INF
        ).astype(jnp.float32)


def _decode_kernel_call_bhsd(q, k, v, kv_length, *, scale, k_scale, v_scale,
                             block_k, interpret, return_lse=False):
    batch, num_heads, head_dim = q.shape
    _, num_heads_k, seqlen_k, _ = k.shape

    block_k = min(block_k, max(-(-seqlen_k // 128) * 128, 128))
    sk_p = -(-seqlen_k // block_k) * block_k
    if sk_p != seqlen_k:
        pads = ((0, 0), (0, 0), (0, sk_p - seqlen_k), (0, 0))
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
    num_k_blocks = sk_p // block_k

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
        s = jnp.broadcast_to(s, (batch, num_heads_k, seqlen_k, 1)).astype(jnp.float32)
        s = jnp.swapaxes(s, 2, 3)  # [B, Hk, 1, S]
        s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, sk_p - seqlen_k)))
        if packed_fp8:
            s = _permute_scale_lanes(s, block_k)
        return s

    ks = scales_arg(k_scale)
    vs = scales_arg(v_scale)

    kv_spec = pl.BlockSpec(
        (1, num_heads_k, block_k, head_dim), lambda b, ki, *_: (b, 0, ki, 0)
    )

    def scale_spec(has):
        if has:
            return pl.BlockSpec(
                (1, num_heads_k, 1, block_k), lambda b, ki, *_: (b, 0, 0, ki)
            )
        return pl.BlockSpec(
            (1, num_heads_k, 1, 1), lambda b, ki, *_: (0, 0, 0, 0)
        )

    kernel = functools.partial(
        _decode_kernel_bhsd,
        block_k=block_k,
        num_k_blocks=num_k_blocks,
        num_heads=num_heads,
        num_heads_k=num_heads_k,
        scale=float(scale),
        has_k_scale=has_ks,
        has_v_scale=has_vs,
        packed_fp8=packed_fp8,
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
