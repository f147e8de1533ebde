"""Fused quantize+append kernel for the contiguous KV cache (B5 hot path).

One decode step must insert one token's K/V per sequence at position
``length[b]`` of every layer.  Pure-XLA formulations all materialize
out-of-proportion work at the Llama-8B shape (measured on v5e, 2-layer
step, benchmarks/r3_append2_probe.py):

  vmap dynamic_update_slice    ~131 us/layer (per-batch slice/DUS chains)
  indexed scatter              ~450 us/layer
  lane-dense scale scatter     ~370 us/layer

This kernel writes the token in place: grid over batch, one (bs=32)-row
cache block per sequence selected by scalar-prefetched ``length``, with
``input_output_aliases`` pinning the cache buffers so the only HBM traffic
is the touched blocks (Hk*32*D bytes per buffer per sequence).  Absmax
quantization (int8 / fp8-e4m3, per token per head — ops/quant.py contract)
runs inside the kernel on the [Hk, D] token, so no quantized intermediates
or scale tensors ever round-trip through HBM.

Scales are stored LANE-DENSE [B, Hk, 1, S] (one fp32 lane per position) —
the exact layout the decode kernel consumes (ops/decode.py scales_arg) —
and, for fp8 caches whose capacity is a multiple of the packed-decode
block (2048), pre-permuted to the packed evens-then-odds lane order so the
decode path does zero per-step scale shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.ops.quant import FP8_MAX

# Row-block size of the in-place cache update; covers int8 (32, 128) tiling.
_BS = 32
# The packed-pair fp8 decode's block size (ops/decode._default_block_k for
# 1-byte KV): scale lanes are pre-permuted in chunks of this when possible.
PACKED_CHUNK = 2048


def _blend(block, vals, sel):
    """jnp.where on possibly-sub-byte-float dtypes via a bitcast detour
    (Mosaic select on fp8 operands is not supported everywhere)."""
    if block.dtype == jnp.float8_e4m3fn:
        b8 = jax.lax.bitcast_convert_type(block, jnp.uint8)
        v8 = jax.lax.bitcast_convert_type(vals.astype(block.dtype), jnp.uint8)
        return jax.lax.bitcast_convert_type(
            jnp.where(sel, v8, b8), jnp.float8_e4m3fn
        )
    return jnp.where(sel, vals.astype(block.dtype), block)


def _append_kernel(len_ref, kc_in, vc_in, ks_in, vs_in, nk_ref, nv_ref,
                   kc_out, vc_out, ks_out, vs_out, *, mode, bs,
                   scale_perm_chunk):
    b = pl.program_id(0)
    pos = len_ref[b]
    p = pos % bs
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs, 1), 2)
    sel = rows == p  # [1, 1, bs, 1]

    def quant(n_ref):
        x = n_ref[...].astype(jnp.float32)  # [1, Hk, D]
        if mode == "none":
            return x, None
        qmax = 127.0 if mode == "int8" else FP8_MAX
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # [1, Hk, 1]
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        y = x / scale
        if mode == "int8":
            y = jnp.clip(jnp.round(y), -127, 127)
        return y, scale

    kvals, kscale = quant(nk_ref)
    vvals, vscale = quant(nv_ref)
    kc_out[...] = _blend(kc_in[...], kvals[:, :, None, :], sel)
    vc_out[...] = _blend(vc_in[...], vvals[:, :, None, :], sel)

    if mode != "none":
        # scale blocks are [1, Hk, 1, sbs] lane-dense; the token's lane is
        # ``pos`` mapped through the packed-decode permutation when the
        # cache is stored pre-permuted (fp8 + aligned capacity).
        sbs = ks_in.shape[-1]
        if scale_perm_chunk:
            half = scale_perm_chunk // 2
            o = pos % scale_perm_chunk
            lane = (o % 2) * half + o // 2
            lane = (pos // scale_perm_chunk) * scale_perm_chunk + lane
        else:
            lane = pos
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sbs), 3)
        lsel = lanes == (lane % sbs)
        ks_out[...] = jnp.where(lsel, kscale[:, :, :, None], ks_in[...])
        vs_out[...] = jnp.where(lsel, vscale[:, :, :, None], vs_in[...])


def kv_append_token(k_cache, v_cache, k_scale, v_scale, new_k, new_v,
                    length, *, mode: str, scale_perm_chunk: int | None = None,
                    interpret: bool | None = None):
    """Insert one token per sequence, in place.

    k_cache/v_cache: [B, Hk, S, D] (int8 / fp8-e4m3 / model dtype);
    k_scale/v_scale: [B, Hk, 1, S] fp32 lane-dense (None for mode='none');
    new_k/new_v: [B, Hk, D] (model dtype, pre-rope'd);
    length: [B] int32 — write position per sequence (must be < S).
    scale_perm_chunk: scale lanes are stored permuted to the packed-decode
    order in chunks of this size (fp8 caches; see PACKED_CHUNK), or None
    for natural order.

    Returns the four updated buffers (aliased: callers must treat the
    inputs as consumed, which pytree-threading through jit does naturally).
    """
    B, Hk, S, D = k_cache.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bs = min(_BS, S)
    if S % bs:
        raise ValueError(f"capacity {S} must be a multiple of {bs}")
    quantized = mode != "none"
    # scale-lane block: one full lane row if S is small, else 512 lanes
    # around the write position (mult-of-128 rule).
    sbs = S if S <= 512 else 512
    if quantized and scale_perm_chunk and sbs < scale_perm_chunk:
        # permuted lane order scatters a chunk's lanes across the chunk;
        # block must cover a whole chunk to address them all
        sbs = scale_perm_chunk

    def kv_map(b, len_ref):
        return (b, 0, len_ref[b] // bs, 0)

    def s_map(b, len_ref):
        if not quantized:
            return (b, 0, 0, 0)
        if scale_perm_chunk:
            # lane index within [0, S): chunk base + permuted offset
            half = scale_perm_chunk // 2
            o = len_ref[b] % scale_perm_chunk
            lane = (o % 2) * half + o // 2
            lane = (len_ref[b] // scale_perm_chunk) * scale_perm_chunk + lane
        else:
            lane = len_ref[b]
        return (b, 0, 0, lane // sbs)

    def n_map(b, len_ref):
        return (b, 0, 0)

    if not quantized:
        # dummy 1-lane scale operands keep one kernel signature
        k_scale = jnp.zeros((1, 1, 1, 128), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1, 128), jnp.float32)
        s_spec = pl.BlockSpec((1, 1, 1, 128), lambda b, l: (0, 0, 0, 0))
    else:
        s_spec = pl.BlockSpec((1, Hk, 1, sbs), s_map)

    kv_spec = pl.BlockSpec((1, Hk, bs, D), kv_map)
    n_spec = pl.BlockSpec((1, Hk, D), n_map)

    kernel = functools.partial(
        _append_kernel, mode=mode, bs=bs,
        scale_perm_chunk=scale_perm_chunk if quantized else None,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[kv_spec, kv_spec, s_spec, s_spec, n_spec, n_spec],
            out_specs=[kv_spec, kv_spec, s_spec, s_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        # inputs: 0=length(prefetch), 1..4=cache buffers, 5..6=new kv
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=interpret,
    )(length, k_cache, v_cache, k_scale, v_scale, new_k, new_v)
    k2, v2, ks2, vs2 = out
    if not quantized:
        return k2, v2, None, None
    return k2, v2, ks2, vs2
