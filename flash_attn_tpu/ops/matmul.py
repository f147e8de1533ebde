"""Pallas weight-only quantized matmul kernels (INT8 / packed-INT4).

BASELINE.json north star: "INT4/INT8 weight-only matmuls with on-the-fly
dequant".  Decode-phase linear layers are HBM-bandwidth-bound: streaming
weights at 1 byte (int8) or 0.5 bytes (int4) per element instead of 2 (bf16)
is a 2-4x speedup at the roofline.

Scales are FOLDED OUT of the matmul (same trick as the decode kernel):
integer weights cast exactly to bf16 (no scale multiply — |w| <= 127 is
representable), the MXU runs on the narrow operands, and scales multiply the
[bm, bn] accumulator — per k-block for grouped scales, once at finalize for
per-column scales.  Dequant cost falls from O(K*N) fp32 multiplies to
O(M*N), which is what makes int8 *faster* than bf16 at decode batch sizes.

INT4 uses the group-local-halves packing from ops/quant.py so the unpack is
a concat, not an interleave.  Grid: (m_block, n_block, k_block), k
innermost, fp32 accumulator in VMEM scratch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.ops.quant import Int4Weight
from flash_attn_tpu.ops.flash_fwd import sdot


def _cdiv(a, b):
    return -(-a // b)


def _default_block_k(K, g, cap):
    """Largest block_k <= cap that is a multiple of g AND divides K.

    The packed-int4 kernels require K % block_k == 0 (scales are grouped
    per k-block); a bare min(cap, K) default fails for K an odd multiple
    of g (e.g. K=1536, g=128).  quantize_int4 guarantees g | K, so gpb=1
    always terminates the search."""
    n_groups = K // g
    gpb = max(1, min(cap // g, n_groups))
    while n_groups % gpb:
        gpb -= 1
    return gpb * g


def _pad2(x, m0, m1):
    p0 = _cdiv(x.shape[0], m0) * m0 - x.shape[0]
    p1 = _cdiv(x.shape[1], m1) * m1 - x.shape[1]
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, nk, out_dtype):
    """Per-column scales: scale the accumulator once at finalize."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)  # exact for |w| <= 127
    acc[...] += sdot(x, w, (((1,), (0,)), ((), ())))

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)).astype(out_dtype)


def matmul_int8(
    x: jax.Array,
    w: jax.Array,
    scales: jax.Array,
    *,
    block_m: int = 128,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=None,
    interpret: bool | None = None,
):
    """x [M, K] (bf16/f32) @ int8 w [K, N] with per-column scales [N] or
    per-(group,N) scales [K//g, N].  Returns [M, N]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw, (x.shape, w.shape)

    block_m = min(block_m, _cdiv(M, 8) * 8)
    block_n = min(block_n, _cdiv(N, 128) * 128)
    block_k = min(block_k, _cdiv(K, 128) * 128)

    if scales.ndim == 1:
        scales2 = jnp.broadcast_to(scales[None, :], (1, N))
        groups_per_block = None  # single row of scales for every k block
    else:
        g = K // scales.shape[0]
        if block_k % g:
            block_k = g
        groups_per_block = block_k // g
        scales2 = scales

    xp = _pad2(x, block_m, block_k)
    wp = _pad2(w, block_k, block_n)
    Mp, Kp = xp.shape
    _, Np = wp.shape
    nk = Kp // block_k

    if groups_per_block is None:
        sp = _pad2(scales2, 1, block_n)
        s_spec = pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni))
        kern = functools.partial(_int8_kernel, nk=nk, out_dtype=out_dtype)
    else:
        # 3D scales [nk, gpb, N] so the per-block spec (1, gpb, bn) is
        # Mosaic-legal (a 2D (gpb, bn) block with gpb < K//g and gpb % 8 != 0
        # violates the tiling rule).
        sp = _pad2(scales2, groups_per_block * nk, block_n).reshape(
            nk, groups_per_block, -1
        )
        s_spec = pl.BlockSpec(
            (1, groups_per_block, block_n), lambda mi, ni, ki: (ki, 0, ni)
        )
        g = block_k // groups_per_block

        def kern(x_ref, w_ref, s_ref, o_ref, acc, *, nk=nk, gpb=groups_per_block,
                 g=g, out_dtype=out_dtype):
            ki = pl.program_id(2)

            @pl.when(ki == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            x_ = x_ref[...]          # [bm, block_k]
            w_ = w_ref[...].astype(x_.dtype)  # [block_k, bn], no scale
            bm = x_.shape[0]
            bn = w_.shape[1]
            # per-group partial products, scales applied to [bm, bn] each:
            # out += sum_g (x_g @ w_g) * s_g[None, :]
            # batch dims must sit at the same position for Mosaic
            xg = jnp.swapaxes(x_.reshape(bm, gpb, g), 0, 1)  # [gpb, bm, g]
            wg = w_.reshape(gpb, g, bn)
            partial = jax.lax.dot_general(
                xg, wg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT
                if x_.dtype != jnp.float32 else jax.lax.Precision.HIGHEST,
            )  # [gpb, bm, bn]
            s = s_ref[0].astype(jnp.float32)  # [gpb, bn]
            acc[...] += jnp.sum(partial * s[:, None, :], axis=0)

            @pl.when(ki == nk - 1)
            def _():
                o_ref[...] = acc[...].astype(out_dtype)

    out = pl.pallas_call(
        kern,
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            s_spec,
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:M, :N]


def _int4_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, nk, gpb, half, out_dtype):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    p = w_ref[...]  # [block_k//2, block_n] uint8, group-local-halves layout
    bn = p.shape[-1]
    bm = x.shape[0]
    g = 2 * half
    # group-local halves: reshape to groups, unpack lo/hi, concat along k.
    # The unpack is the kernel's VPU bottleneck (decode-shape M=8 is
    # unpack-bound, not DMA-bound: ~5 ops per packed byte vs 1.2 us/MB of
    # DMA), so it is kept minimal: widen to int32 (Mosaic has no int8
    # sub), one mask for lo, one shift for hi (uint8 source: >>4 already
    # leaves 0..15, no second mask), and NO per-element offset subtract —
    # the symmetric -8 decodes algebraically on the accumulator instead:
    #   sum_k x_k (n_k - 8) s = (sum_k x_k n_k) s - 8 s (sum_k x_k)
    # with the per-group x-sums costing O(bm*block_k) instead of the two
    # O(block_k*bn) subtracts.
    pg = p.reshape(gpb, half, bn).astype(jnp.int32)
    lo = (pg & 0x0F).astype(x.dtype)
    hi = (pg >> 4).astype(x.dtype)
    vals = jnp.concatenate([lo, hi], axis=1)  # [gpb, g, bn], nibbles 0..15
    prec = (
        jax.lax.Precision.DEFAULT
        if x.dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    )
    s = s_ref[0].astype(jnp.float32)  # [gpb, bn]
    if g % 128 == 0:
        # scales fold onto the [gpb, bm, bn] partials, not the [K, bn]
        # weights; one batched dot over groups
        xg = jnp.swapaxes(x.reshape(bm, gpb, g), 0, 1)  # [gpb, bm, g]
        partial = jax.lax.dot_general(
            xg, vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [gpb, bm, bn]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [gpb, bm]
        partial = partial - 8.0 * xsum[:, :, None]
        acc[...] += jnp.sum(partial * s[:, None, :], axis=0)
    else:
        # g < 128: Mosaic can't shape-cast the lane dim into (gpb, g) —
        # unroll the (few) groups as lane-sliced dots, folding each
        # group's scale and -8 offset on its partial (exact, same algebra)
        add = jnp.zeros_like(acc[...])
        for i in range(gpb):
            xi = x[:, i * g : (i + 1) * g]
            partial = jax.lax.dot_general(
                xi, vals[i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [bm, bn]
            xsum = jnp.sum(xi.astype(jnp.float32), axis=1)  # [bm]
            add += (partial - 8.0 * xsum[:, None]) * s[i][None, :]
        acc[...] += add

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc[...].astype(out_dtype)


def _int4_plane_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, nk, gpb, g,
                       out_dtype, interpret):
    """Whole-i32-word nibble decode for the "planes" packing (the fp8
    packed-pair trick applied to int4): for each nibble position p, one
    shift + one mask + one OR over the int32 words builds bf16 lanes with
    the nibble in mantissa bits 3-6 and exponent 127, i.e. EXACTLY
    1 + n/16 — ~1.5 VPU ops per element (the halves kernel needs ~2.5)
    and zero concat/shuffle, because the packing places each decoded
    plane as a contiguous run of g/4 value rows.  The affine decode
    (w = n - 8 = 16*v - 24) folds on the [bm, bn] accumulator via
    per-group x-sums."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]  # [bm, block_k]
    p = w_ref[...]  # [block_k//2, bn] uint8, plane layout
    bm = x.shape[0]
    bn = p.shape[-1]
    quarter = g // 4
    xg = jnp.swapaxes(x.reshape(bm, gpb, g), 0, 1)  # [gpb, bm, g]
    s = s_ref[0].astype(jnp.float32)  # [gpb, bn]
    prec = (
        jax.lax.Precision.DEFAULT
        if x.dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    )
    dims = (((2,), (1,)), ((0,), (0,)))

    if interpret:
        # pltpu.bitcast has no interpret lowering: decode with plain jnp.
        # The plane packing makes value order = [even-row lo; even-row hi;
        # odd-row lo; odd-row hi] per group, so strided slices reconstruct
        # it with no gather (exact integers — numerics identical).
        pg = p.reshape(gpb, g // 2, bn).astype(jnp.int32)
        ev, od = pg[:, 0::2], pg[:, 1::2]
        vals = jnp.concatenate(
            [ev & 0x0F, ev >> 4, od & 0x0F, od >> 4], axis=1
        ).astype(x.dtype)
        vals = vals - jnp.asarray(8, x.dtype)
        partial = jax.lax.dot_general(
            xg, vals, dims, preferred_element_type=jnp.float32,
            precision=prec,
        )
        acc[...] += jnp.sum(partial * s[:, None, :], axis=0)
    else:
        w32 = pltpu.bitcast(p, jnp.int32)  # [block_k//8, bn]
        partial = None
        for pidx in range(4):
            t = (w32 << 3) if pidx == 0 else (w32 >> (4 * pidx - 3))
            t = (t & 0x00780078) | 0x3F803F80
            plane = pltpu.bitcast(t, jnp.bfloat16)  # [block_k//4, bn]
            pv = plane.reshape(gpb, quarter, bn)
            if x.dtype != jnp.bfloat16:
                pv = pv.astype(x.dtype)
            xp = xg[:, :, pidx * quarter : (pidx + 1) * quarter]
            d = jax.lax.dot_general(
                xp, pv, dims, preferred_element_type=jnp.float32,
                precision=prec,
            )  # [gpb, bm, bn]
            partial = d if partial is None else partial + d
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [gpb, bm]
        partial = 16.0 * partial - 24.0 * xsum[:, :, None]
        acc[...] += jnp.sum(partial * s[:, None, :], axis=0)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc[...].astype(out_dtype)


# Above this M, the packed-int4 matmuls are COMPUTE-bound, not
# weight-streaming-bound, and the in-kernel decode machinery only steals
# MXU time: dequantize once and ride the bf16 MXU at full rate instead.
# On-chip at [M x 4096 x 14336], g=128: dequant+dot 542/1492 us at
# M=512/2048 vs 721/2983 for the decode kernel (bf16 itself: 325/1241);
# M=256 is a wash (380 vs ~360).
_PREFILL_M = 512


def _dequant_dot(x, w, out_dtype):
    """Prefill path for packed-int4 weights: XLA-fused dequantize (strided
    slices + concat, no gather) then a plain bf16 MXU dot."""
    from flash_attn_tpu.ops.quant import dequantize_int4

    wf = dequantize_int4(w, dtype=x.dtype)
    return jnp.dot(
        x, wf, preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    ).astype(out_dtype)


_PLANES_PROBE_OK = False


def _probe_planes_decode():
    """One-time real-hardware guard for the whole-word nibble decode: the
    planes kernel's correctness hinges on pltpu.bitcast's uint8->int32
    byte/sublane order and int32->bf16 half order matching
    quant._plane_row_sources.  CPU CI cannot see a mismatch (the interpret
    branch decodes with plain jnp), so the first non-interpret planes
    matmul in a process runs a tiny known-pattern weight through the real
    kernel and checks it against the dequantize oracle — raising
    immediately instead of silently corrupting every default-group-size
    int4 weight if a JAX/Mosaic change ever reorders the bitcast packing."""
    global _PLANES_PROBE_OK
    if _PLANES_PROBE_OK:
        return
    try:
        from jax._src import core as _core

        if not _core.trace_state_clean():
            # Called while TRACING a jit function: under omnistaging even
            # constant-input ops stage as tracers, and pallas_call has no
            # eval rule under ensure_compile_time_eval.  Skip — the probe
            # runs at quantize_int4 time (eager model load) instead.
            return
    except (ImportError, AttributeError):  # private API moved: fail open
        pass
    _PLANES_PROBE_OK = True  # set first: the probe itself calls matmul_int4
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    wf = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.float32)
    w = quantize_int4(wf, group_size=128, clip_search=False, layout="planes")
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 128)).astype(jnp.bfloat16)
    got = matmul_int4(x, w, out_dtype=jnp.float32, interpret=False)
    want = jnp.dot(x.astype(jnp.float32), dequantize_int4(w),
                   preferred_element_type=jnp.float32)
    err = jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9)
    if not bool(err < 1e-2):  # an order mismatch permutes rows: err ~ O(1)
        raise RuntimeError(
            "int4 'planes' decode mismatch on this backend: pltpu.bitcast "
            f"ordering no longer matches the packing (rel err {float(err):.3g})."
            " Quantize with layout='halves' until the kernel is fixed."
        )


def matmul_int4(
    x: jax.Array,
    w: Int4Weight,
    *,
    block_m: int = 128,
    block_n: int = 2048,
    block_k: int | None = None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """x [M, K] @ packed-int4 w (K, N) with per-(group, N) scales.

    Defaults bn=2048 / bk=min(1024, K): the r4 on-chip sweep at the
    decode gate shape [8 x 4096 x 14336] ranks (2048, 1024) first at
    59.2 us vs 68.2 for the old (1024, 512) — the kernel is VPU
    unpack-bound, and wider n-blocks amortize the per-group x-sum and
    unpack overhead (benchmarks/sweep.py matmul --w int4)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw, (x.shape, w.shape)
    if M >= _PREFILL_M:
        return _dequant_dot(x, w, out_dtype)
    g = w.group_size
    block_k = block_k or _default_block_k(K, g, 1024)
    if block_k % g:
        block_k = g
    gpb = block_k // g  # groups per k-block
    half = g // 2

    block_m = min(block_m, _cdiv(M, 8) * 8)
    block_n = min(block_n, _cdiv(N, 128) * 128)
    # The grouped-dot kernels (g % 128 == 0) hold an fp32 [gpb, bm, bn]
    # partial in VMEM; the bn=2048 decode-shape default (bm=8: 0.5 MB)
    # blows the 16 MB scoped limit at prefill bm=128 (8*128*2048*4 =
    # 8.4 MB plus planes/buffers, measured 23.5 MB > 16).  Halve bn until
    # the partial fits a ~4 MB budget.  The unrolled g < 128 path's
    # partial is only [bm, bn], but it materializes the decoded
    # [block_k, bn] weights (int32 nibbles + casts), so ITS budget is
    # block_k-scaled — with more headroom than the gpb rule (8 MB) so
    # group_size=32 decode shapes keep wide n-blocks.
    if g % 128 == 0:
        while gpb * block_m * block_n * 4 > 4 << 20 and block_n > 512:
            block_n //= 2
    else:
        while block_k * block_n * 4 > 8 << 20 and block_n > 512:
            block_n //= 2
    if K % block_k:
        raise ValueError(f"K ({K}) must be a multiple of block_k ({block_k})")

    xp = _pad2(x, block_m, block_k)
    packed = _pad2(w.packed, block_k // 2, block_n)
    nk = K // block_k
    sp = _pad2(w.scales, gpb * nk, block_n).reshape(nk, gpb, -1)
    Mp = xp.shape[0]
    Np = packed.shape[1]

    layout = getattr(w, "layout", "halves")
    if layout == "planes":
        if g % 128:
            raise ValueError("planes layout requires group_size % 128 == 0")
        if not interpret:
            _probe_planes_decode()
        kern = functools.partial(
            _int4_plane_kernel, nk=nk, gpb=gpb, g=g, out_dtype=out_dtype,
            interpret=interpret,
        )
    else:
        kern = functools.partial(
            _int4_kernel, nk=nk, gpb=gpb, half=half, out_dtype=out_dtype
        )

    out = pl.pallas_call(
        kern,
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k // 2, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, gpb, block_n), lambda mi, ni, ki: (ki, 0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, packed, sp)
    return out[:M, :N]


def _w8a8_kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref, acc, *, nk, out_dtype):
    """Native int8 x int8 MXU with int32 accumulation; scales (per-row
    activation x per-column weight) applied once at finalize.  Removes the
    int8->bf16 weight cast from the hot loop that pinned large-N matmul at
    ~0.3 of the weight-streaming roofline (round-1 Weak #7)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]  # [bm, bk] int8
    w = w_ref[...]  # [bk, bn] int8
    acc[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(ki == nk - 1)
    def _():
        sx = sx_ref[...].astype(jnp.float32)  # [bm, 1]
        sw = sw_ref[...].astype(jnp.float32)  # [1, bn]
        o_ref[...] = (acc[...].astype(jnp.float32) * sx * sw).astype(out_dtype)


def quantize_activations(x: jax.Array):
    """Per-row (token) symmetric int8 quantization: x [M, K] ->
    (xq int8 [M, K], scale fp32 [M, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def matmul_w8a8(
    x: jax.Array,
    w: jax.Array,
    scales: jax.Array,
    *,
    block_m: int = 128,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=None,
    interpret: bool | None = None,
):
    """W8A8: x [M, K] float -> dynamic per-token int8, int8 w [K, N] with
    per-column scales [N]; int8 x int8 MXU, int32 accumulation.

    out ≈ (x @ dequant(w)); activation-quant error ~0.4% rms (int8 rounding)
    — the decode-MLP trade the BASELINE int8-weight configs make.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw, (x.shape, w.shape)
    if scales.ndim != 1:
        raise ValueError("w8a8 requires per-column weight scales [N]")

    xq, sx = quantize_activations(x)

    block_m = min(block_m, _cdiv(M, 32) * 32)
    block_n = min(block_n, _cdiv(N, 128) * 128)
    block_k = min(block_k, _cdiv(K, 128) * 128)

    xp = _pad2(xq, block_m, block_k)
    wp = _pad2(w, block_k, block_n)
    sxp = _pad2(sx, block_m, 1)
    swp = _pad2(scales[None, :], 1, block_n)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    nk = Kp // block_k

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, nk=nk, out_dtype=out_dtype),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, sxp, wp, swp)
    return out[:M, :N]


def _w4a8_kernel(x_ref, sx_ref, w_ref, s_ref, o_ref, acc, *, nk, gpb, g,
                 out_dtype, interpret):
    """Packed-int4 weights on the NATIVE s8 x s8 MXU (W4A8): nibble planes
    are decoded with THREE whole-i32-word VPU ops per four packed bytes —
    (w32 & 0x0F0F0F0F) is every byte's lo nibble and
    ((w32 >> 4) & 0x0F0F0F0F) every byte's hi nibble, both byte-symmetric,
    so (unlike the bf16 'planes' decode) the result is INDEPENDENT of
    pltpu.bitcast's byte/sublane ordering — then fed straight to the MXU
    as int8 with int32 accumulation.  ~0.4 VPU ops per weight element vs
    ~1.5 for the bf16 planes decode and ~2.5 for halves: the int4 unpack
    stops being the kernel's bottleneck, and the MXU feed is cast-free
    (the w8a8 recipe, halved weight bytes).

    Halves packing makes each plane a CONTIGUOUS run of g/2 value rows per
    group (byte row j of group i holds value rows i*g+j and i*g+g/2+j), so
    the lo/hi planes pair with x's per-group halves with no shuffle.  The
    symmetric -8 offset folds on the accumulator via per-group x-sums
    (exact: sum_k x_k (n_k - 8) = dot(x, n) - 8 * sum_k x_k), and the
    per-(group, col) weight scales multiply the [gpb, bm, bn] int32
    partials in fp32; the per-row activation scale applies at finalize.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    xq = x_ref[...]  # [bm, block_k] int8
    p = w_ref[...]   # [block_k//2, bn] uint8, halves layout
    bm = xq.shape[0]
    bn = p.shape[-1]
    half = g // 2

    if interpret:
        # pltpu.bitcast has no interpret lowering; plain jnp decode is
        # bit-identical (the masks are byte-symmetric).
        p32 = p.astype(jnp.int32)
        lo8 = (p32 & 0x0F).astype(jnp.int8)
        hi8 = (p32 >> 4).astype(jnp.int8)
    else:
        w32 = pltpu.bitcast(p, jnp.int32)  # [block_k//8, bn]
        lo8 = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
        hi8 = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    lo_g = lo8.reshape(gpb, half, bn)  # value rows i*g ..  i*g+g/2
    hi_g = hi8.reshape(gpb, half, bn)  # value rows i*g+g/2 .. (i+1)*g

    xg = jnp.swapaxes(xq.reshape(bm, gpb, g), 0, 1)  # [gpb, bm, g]
    x_lo = xg[:, :, :half]
    x_hi = xg[:, :, half:]
    dims = (((2,), (1,)), ((0,), (0,)))
    d = jax.lax.dot_general(
        x_lo, lo_g, dims, preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    ) + jax.lax.dot_general(
        x_hi, hi_g, dims, preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [gpb, bm, bn]
    s = s_ref[0].astype(jnp.float32)  # [gpb, bn]
    # the -8 offset rides the MXU, not the VPU: sum_g s[g,n] * 8*xsum[g,m]
    # is a [bm, gpb] x [gpb, bn] dot, removing the per-(g,m,n) int subtract
    xsum = jnp.sum(xg, axis=2, dtype=jnp.float32)  # [gpb, bm]
    offs = jax.lax.dot_general(
        jnp.swapaxes(xsum, 0, 1), s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [bm, bn]
    partial = d.astype(jnp.float32)
    acc[...] += jnp.sum(partial * s[:, None, :], axis=0) - 8.0 * offs

    @pl.when(ki == nk - 1)
    def _():
        sx = sx_ref[...].astype(jnp.float32)  # [bm, 1]
        o_ref[...] = (acc[...] * sx).astype(out_dtype)


def matmul_w4a8(
    x: jax.Array,
    w,
    *,
    block_m: int = 128,
    block_n: int = 2048,
    block_k: int | None = None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """x [M, K] float -> dynamic per-token int8, packed-int4 w (K, N)
    (halves layout) with per-(group, N) scales, on the s8 x s8 MXU.

    out ≈ x @ dequantize_int4(w) with int8 activation-quant noise on top
    of the int4 weight error — the W4A8 serving mode (BASELINE config 4's
    70B INT4 row at full weight-streaming speed)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw, (x.shape, w.shape)
    if getattr(w, "layout", "halves") != "halves":
        raise ValueError("matmul_w4a8 requires the 'halves' int4 layout")
    if M >= _PREFILL_M:
        # prefill: compute-bound — activation quant stops paying (it only
        # buys weight-streaming bandwidth) and the s8 grouped-dot path is
        # 4x slower than the bf16 MXU here.  Weight-only dequant+dot is
        # both faster AND numerically closer to the float model; a8 noise
        # applies only at decode shapes, where the ppl ladder measures it.
        return _dequant_dot(x, w, out_dtype)
    g = w.group_size
    # bk=2048 default from the on-chip g=128 sweep (45.0 us / 0.80 of the
    # weight-streaming roofline at [8 x 4096 x 14336] vs 46.7 at bk=1024)
    block_k = block_k or _default_block_k(K, g, 2048)
    if block_k % g:
        block_k = g
    gpb = block_k // g

    xq, sx = quantize_activations(x)

    # bm rounds to 8, not 32: Mosaic lowers 8-sublane int8 blocks fine, and
    # the [gpb, bm, bn] partial handling is the kernel's VPU cost — at
    # decode M=8 a 32-row block would 4x it (on-chip: 0.67 -> 0.80 of the
    # weight-streaming roofline at the 8B gate shape, g=128).
    block_m = min(block_m, _cdiv(M, 8) * 8)
    block_n = min(block_n, _cdiv(N, 128) * 128)
    # int32 [gpb, bm, bn] dot outputs + fp32 partials: 8 bytes/elem budget
    # (bn=4096 at gpb=8/bm=32 compiled OOM with the 4-byte estimate).
    while gpb * block_m * block_n * 8 > 4 << 20 and block_n > 512:
        block_n //= 2
    # prefill bm=128 at bk=2048/g=128 still holds 8+ MB at bn=512 — shed
    # groups per block instead.  gpb must stay a divisor of K//g (plain
    # halving broke both the block_k % g == 0 kernel invariant and the
    # K % block_k check for K an odd multiple of g, e.g. K=1152 g=128).
    n_groups = K // g
    while gpb > 1 and gpb * block_m * block_n * 8 > 4 << 20:
        gpb = next(d for d in range(gpb - 1, 0, -1) if n_groups % d == 0)
        block_k = gpb * g
    if K % block_k:
        raise ValueError(f"K ({K}) must be a multiple of block_k ({block_k})")

    xp = _pad2(xq, block_m, block_k)
    packed = _pad2(w.packed, block_k // 2, block_n)
    sxp = _pad2(sx, block_m, 1)
    nk = K // block_k
    sp = _pad2(w.scales, gpb * nk, block_n).reshape(nk, gpb, -1)
    Mp = xp.shape[0]
    Np = packed.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _w4a8_kernel, nk=nk, gpb=gpb, g=g, out_dtype=out_dtype,
            interpret=interpret,
        ),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((block_k // 2, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, gpb, block_n), lambda mi, ni, ki: (ki, 0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, sxp, packed, sp)
    return out[:M, :N]


@jax.tree_util.register_pytree_node_class
@dataclass
class W4A8Weight:
    """Packed int4 weight ('halves' layout; [K//2, N] uint8 + per-(group, N)
    fp32 scales), flagged for the s8 x s8 MXU path with dynamic per-token
    int8 activations (matmul_w4a8).  Same packing as Int4Weight — the class
    IS the dispatch flag (a string tag cannot ride as a jit argument)."""

    packed: jax.Array
    scales: jax.Array
    group_size: int
    shape: tuple  # original (K, N)

    @property
    def layout(self):
        return "halves"

    def tree_flatten(self):
        return (self.packed, self.scales), (self.group_size, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


@jax.tree_util.register_pytree_node_class
@dataclass
class W8A8Weight:
    """int8 weight [K, N] + per-column scales [N], flagged for the NATIVE
    int8 x int8 MXU path (dynamic per-token activation quant in
    matmul_w8a8).  A pytree class (not the legacy ("w8a8", vals, scales)
    tuple, whose string tag cannot ride as a jit argument)."""

    vals: jax.Array
    scales: jax.Array

    def tree_flatten(self):
        return (self.vals, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class BiasedWeight:
    """A projection weight of ANY supported kind plus an output bias [N]
    (Qwen-2-style qkv bias).  quantized_matmul unwraps it, so every model
    path — float, int8, int4, w8a8, LoRA-composed — picks the bias up
    transparently; weight-only quantization quantizes the inner ``w`` and
    keeps the bias float."""

    w: object
    bias: jax.Array

    def tree_flatten(self):
        return (self.w, self.bias), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def concat_weights(ws):
    """Concatenate projection weights of the SAME kind along the output (N)
    axis, so several same-input matmuls fuse into one kernel call (qkv,
    gate+up).  Exact: every supported scheme (per-column int8/w8a8 scales,
    per-(K-group, column) int4 scales) is column-independent, so
    quantize-then-concat == concat-then-quantize and the fused matmul's
    k-loop accumulates each output column identically to the unfused call.
    The composed decode step pays a fixed cost per pallas_call (r4 device
    trace: 15 matmul calls/step at ~190 us over the streaming floor), so
    fewer, wider calls is pure win at decode batch sizes."""
    kinds = {type(w) for w in ws}
    if len(kinds) != 1:
        raise ValueError(f"cannot concat mixed weight kinds: {kinds}")
    w0 = ws[0]
    if isinstance(w0, BiasedWeight):
        return BiasedWeight(
            concat_weights([w.w for w in ws]),
            jnp.concatenate([w.bias for w in ws]),
        )
    if isinstance(w0, Int4Weight):
        if len({w.group_size for w in ws}) != 1 or len(
            {w.shape[0] for w in ws}
        ) != 1 or len({getattr(w, "layout", "halves") for w in ws}) != 1:
            raise ValueError("int4 concat needs equal K, group_size, layout")
        return Int4Weight(
            jnp.concatenate([w.packed for w in ws], axis=1),
            jnp.concatenate([w.scales for w in ws], axis=1),
            w0.group_size,
            (w0.shape[0], sum(w.shape[1] for w in ws)),
            getattr(w0, "layout", "halves"),
        )
    if isinstance(w0, W4A8Weight):
        if len({w.group_size for w in ws}) != 1 or len(
            {w.shape[0] for w in ws}
        ) != 1:
            raise ValueError("w4a8 concat needs equal K and group_size")
        return W4A8Weight(
            jnp.concatenate([w.packed for w in ws], axis=1),
            jnp.concatenate([w.scales for w in ws], axis=1),
            w0.group_size,
            (w0.shape[0], sum(w.shape[1] for w in ws)),
        )
    if isinstance(w0, W8A8Weight):
        return W8A8Weight(
            jnp.concatenate([w.vals for w in ws], axis=1),
            jnp.concatenate([w.scales for w in ws]),
        )
    if isinstance(w0, tuple) and len(w0) == 3 and w0[0] == "w8a8":
        return (
            "w8a8",
            jnp.concatenate([w[1] for w in ws], axis=1),
            jnp.concatenate([w[2] for w in ws]),
        )
    if isinstance(w0, tuple):
        # scales: [N] per-column or [K//g, N] grouped — N is the last axis
        return (
            jnp.concatenate([w[0] for w in ws], axis=1),
            jnp.concatenate([w[1] for w in ws], axis=w0[1].ndim - 1),
        )
    return jnp.concatenate(ws, axis=1)


def quantized_matmul(x, w, *, out_dtype=None, interpret=None):
    """Dispatch on weight type: BiasedWeight (any inner kind + bias),
    Int4Weight, (int8, scales) weight-only tuple, ('w8a8', int8, scales)
    activation+weight int8, or plain float array (falls through to
    jnp.dot)."""
    if isinstance(w, BiasedWeight):
        y = quantized_matmul(x, w.w, out_dtype=out_dtype, interpret=interpret)
        return (
            y.astype(jnp.float32) + w.bias.astype(jnp.float32)
        ).astype(y.dtype)
    if isinstance(w, Int4Weight):
        return matmul_int4(x, w, out_dtype=out_dtype, interpret=interpret)
    if isinstance(w, W4A8Weight):
        return matmul_w4a8(x, w, out_dtype=out_dtype, interpret=interpret)
    if isinstance(w, W8A8Weight):
        return matmul_w8a8(x, w.vals, w.scales, out_dtype=out_dtype,
                           interpret=interpret)
    if isinstance(w, tuple) and len(w) == 3 and w[0] == "w8a8":
        _, vals, scales = w
        return matmul_w8a8(x, vals, scales, out_dtype=out_dtype,
                           interpret=interpret)
    if isinstance(w, tuple):
        vals, scales = w
        return matmul_int8(x, vals, scales, out_dtype=out_dtype, interpret=interpret)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        out_dtype or x.dtype
    )
