"""Quantization primitives: INT8 / FP8(E4M3) / packed-INT4 with absmax scales.

These back the two quantized paths from the BASELINE.json north star:
- KV-cache quantization (quantize-on-append; dequant fused into the decode
  kernel's QK^T and PV contractions — see ops/decode.py),
- weight-only INT4/INT8 matmuls with on-the-fly dequant (ops/matmul.py).

Conventions:
- scales are always fp32 and multiply on dequant: ``x ≈ values * scale``;
- INT8 uses symmetric absmax over the reduced axes, range ±127;
- FP8 is ``float8_e4m3fn`` scaled so the absmax maps to 448 (its max normal);
- INT4 is stored two-per-byte in uint8 (low nibble = even index along the
  packed axis), symmetric range ±7, with per-group scales along the packed
  axis (group_size contraction entries share one scale).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn max normal


def _absmax_scale(x: jax.Array, axes, qmax: float) -> jax.Array:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.where(amax > 0, amax / qmax, 1.0)


def quantize_int8(x: jax.Array, axes=(-1,)):
    """Symmetric INT8: returns (values int8, scale fp32 with reduced axes
    kept as 1)."""
    scale = _absmax_scale(x, axes, 127.0)
    vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return vals.astype(jnp.int8), scale


def quantize_fp8(x: jax.Array, axes=(-1,)):
    """FP8 E4M3 with absmax scaling to the format's full range."""
    scale = _absmax_scale(x, axes, FP8_MAX)
    vals = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return vals, scale


def dequantize(values: jax.Array, scale: jax.Array, dtype=jnp.float32):
    return (values.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# INT4 (packed) — weight-only
# ---------------------------------------------------------------------------


@dataclass
class Int4Weight:
    """Packed int4 weight for [K, N] matmul: packed [K//2, N] uint8,
    scales [K//group_size, N] fp32.

    layout: nibble placement within each group of ``group_size`` k-rows.
    - "halves": packed row j holds (row j, row j + g/2) in (lo, hi) —
      in-kernel unpack is one concat, no interleave shuffle.
    - "planes": rows are placed so the whole-i32-word mantissa-OR decode
      (_int4_plane_kernel in ops/matmul.py — the fp8 packed-pair trick
      applied to nibbles: value = 1 + n/16 exactly in bf16, offsets
      folded on the accumulator) emits each of its four nibble planes as
      a CONTIGUOUS run of g/4 value rows: no concat, no x permute, ~1.5
      VPU ops per element instead of ~2.5.  Requires group_size % 128 == 0
      (the grouped-dot kernel path)."""

    packed: jax.Array
    scales: jax.Array
    group_size: int
    shape: tuple  # original (K, N)
    layout: str = "halves"

    def tree_flatten(self):
        return (self.packed, self.scales), (
            self.group_size, self.shape, self.layout,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scales = children
        layout = aux[2] if len(aux) > 2 else "halves"
        return cls(packed, scales, aux[0], aux[1], layout)


def _plane_row_sources(g: int):
    """For the "planes" layout: value-row index stored in (lo, hi) of each
    packed row r in 0..g/2 (see _int4_plane_kernel for the derivation from
    pltpu.bitcast's word/lane order: bf16 row m of plane p decodes packed
    row 2m + (p >= 2), nibble (lo if p even... p in {0: lo@even, 1: hi@even,
    2: lo@odd, 3: hi@odd}), and plane p must emit value rows
    p*g/4 + m)."""
    import numpy as np

    half, quarter = g // 2, g // 4
    lo_src = np.empty(half, np.int64)
    hi_src = np.empty(half, np.int64)
    for r in range(half):
        m = r // 2
        if r % 2 == 0:
            lo_src[r] = 0 * quarter + m  # plane 0
            hi_src[r] = 1 * quarter + m  # plane 1
        else:
            lo_src[r] = 2 * quarter + m  # plane 2
            hi_src[r] = 3 * quarter + m  # plane 3
    return lo_src, hi_src


jax.tree_util.register_pytree_node(
    Int4Weight, Int4Weight.tree_flatten, Int4Weight.tree_unflatten
)


def quantize_int4(w: jax.Array, group_size: int = 128,
                  clip_search: bool = True,
                  layout: str | None = None) -> Int4Weight:
    """Quantize [K, N] weights to packed int4 with per-(group, N) scales.

    Packing is *group-local halves*, not interleaved: within each group of
    ``group_size`` k-rows, packed row j holds (row j, row j + group_size/2)
    in its (low, high) nibbles.  This makes the in-kernel unpack a single
    concat along k — no interleave shuffle on the VPU (SURVEY.md §7 hard
    part (d): TPU-friendly unpack layout).

    clip_search: per-(group, column) MSE-optimal clipping — try a few clip
    ratios below amax and keep the scale with the least round-trip squared
    error (round-to-nearest under a slightly tighter clip beats pure
    absmax because the largest weight stops dictating the step size).
    Load-time cost only; strictly includes the absmax solution.
    """
    K, N = w.shape
    if group_size % 2:
        raise ValueError("group_size must be even")
    if K % group_size:
        raise ValueError(f"K ({K}) must be a multiple of group_size ({group_size})")
    g = group_size
    wf = w.astype(jnp.float32).reshape(K // g, g, N)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scales = jnp.where(amax > 0, amax / 7.0, 1.0)  # [K//g, 1, N]
    if clip_search:
        best_err = None
        best_scales = scales
        for c in (1.0, 0.95, 0.9, 0.85, 0.8):
            sc = jnp.where(amax > 0, amax * (c / 7.0), 1.0)
            qc = jnp.clip(jnp.round(wf / sc), -7, 7)
            err = jnp.sum(jnp.square(qc * sc - wf), axis=1, keepdims=True)
            if best_err is None:
                best_err, best_scales = err, sc
            else:
                take = err < best_err
                best_err = jnp.where(take, err, best_err)
                best_scales = jnp.where(take, sc, best_scales)
        scales = best_scales
    q = jnp.clip(jnp.round(wf / scales), -7, 7).astype(jnp.int8)  # [K//g, g, N]
    qu = (q + 8).astype(jnp.uint8)
    if layout is None:
        layout = "planes" if group_size % 128 == 0 else "halves"
    if layout == "planes":
        # Load-time guard (advisor r4): the planes matmul's whole-word
        # bitcast decode is backend-ordering-sensitive; verify it on this
        # backend once per process, at quantize (model-load) time, where
        # evaluation is eager.  TPU only: the probe runs a Mosaic kernel
        # (interpret mode decodes with plain jnp, and quantize itself
        # must keep working on any other backend).  Skipped under an
        # active trace (then the matmul's first eager call runs it).
        if jax.default_backend() == "tpu":
            from flash_attn_tpu.ops.matmul import _probe_planes_decode

            _probe_planes_decode()
        lo_src, hi_src = _plane_row_sources(g)
        lo = jnp.take(qu, jnp.asarray(lo_src), axis=1)
        hi = jnp.take(qu, jnp.asarray(hi_src), axis=1)
    elif layout == "halves":
        lo = qu[:, : g // 2]  # first half of each group
        hi = qu[:, g // 2 :]  # second half
    else:
        raise ValueError(f"unknown int4 layout {layout!r}")
    packed = (lo | (hi << 4)).reshape(K // 2, N).astype(jnp.uint8)
    return Int4Weight(packed, scales[:, 0, :], group_size, (K, N), layout)


def unpack_int4(packed: jax.Array, group_size: int,
                layout: str = "halves") -> jax.Array:
    """Inverse of the group-local packing: [K//2, N] uint8 ->
    [K, N] int8 in [-8, 7] (value-row order)."""
    K2, N = packed.shape
    g = group_size
    p = packed.reshape(K2 * 2 // g, g // 2, N)
    lo = (p & jnp.uint8(0x0F)).astype(jnp.int8) - 8
    hi = ((p >> 4) & jnp.uint8(0x0F)).astype(jnp.int8) - 8
    if layout == "halves":
        vals = jnp.concatenate([lo, hi], axis=1)
    elif layout == "planes":
        # value order is [even-row lo; even-row hi; odd-row lo;
        # odd-row hi] per group (see _plane_row_sources: plane p holds
        # value rows [p*g/4, (p+1)*g/4) with within-plane row m at packed
        # row 2m + (p >= 2)) — strided slices + one concat, no gather
        # (jnp.take here lowered to a device gather that made
        # dequantize-then-dot 1.3x slower at prefill shapes).
        ev_lo, ev_hi = lo[:, 0::2], hi[:, 0::2]
        od_lo, od_hi = lo[:, 1::2], hi[:, 1::2]
        vals = jnp.concatenate([ev_lo, ev_hi, od_lo, od_hi], axis=1)
    else:
        raise ValueError(f"unknown int4 layout {layout!r}")
    return vals.reshape(K2 * 2, N)


def dequantize_int4(w: Int4Weight, dtype=jnp.float32) -> jax.Array:
    K, N = w.shape
    vals = unpack_int4(
        w.packed, w.group_size, getattr(w, "layout", "halves")
    ).astype(jnp.float32)  # [K, N]
    scales = jnp.repeat(w.scales, w.group_size, axis=0)  # [K, N]
    return (vals * scales).astype(dtype)


# ---------------------------------------------------------------------------
# KV-cache quantization helpers (quantize-on-append granularity: per token,
# per KV head -> scale shape [..., 1] broadcast over head_dim)
# ---------------------------------------------------------------------------


def quantize_kv(k: jax.Array, v: jax.Array, mode: str):
    """Quantize new KV entries. k/v: [..., Hk, D]; scales per (token, head).

    mode: 'int8' | 'fp8' | 'none'. Returns (kq, k_scale, vq, v_scale).
    """
    if mode == "none":
        return k, None, v, None
    if mode == "int8":
        kq, ks = quantize_int8(k, axes=(-1,))
        vq, vs = quantize_int8(v, axes=(-1,))
        return kq, ks, vq, vs
    if mode == "fp8":
        kq, ks = quantize_fp8(k, axes=(-1,))
        vq, vs = quantize_fp8(v, axes=(-1,))
        return kq, ks, vq, vs
    raise ValueError(f"unknown kv quant mode: {mode!r}")
