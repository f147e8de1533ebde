"""KV-cache state: per-layer contiguous caches with optional INT8/FP8
quantize-on-append (BASELINE.json north star: quantized KV with dequant fused
into the decode kernel — see ops/decode.py).

The cache is a pytree of PER-LAYER arrays:
  k, v:        L-tuples of [B, Hk, S_max, D]  (quantized dtype or model dtype)
  k_scale/...: L-tuples of [B, Hk, 1, S_max]  (fp32 LANE-DENSE; None for
               mode='none')
  length:      [B] int32 — valid entries per sequence

Why per-layer tuples, not one stacked [L, B, Hk, S, D] buffer: the round-2
stacked layout forced `k[layer]` slices to feed each pallas_call, and XLA
materialised the whole 64 MB layer slab per layer per decode step (measured
~1 ms/layer of slice/DUS fusions in the r3 device trace — 2.5 ms/step vs
0.68 ms/step for per-layer arrays at the Llama-8B decode shape,
benchmarks/r3_layercache_probe.py).  With per-layer arrays, `layer(i)` is a
zero-copy reference and appends are in-place writes on the scan-carried
buffers.

Scale layout: scales are stored LANE-DENSE [B, Hk, 1, S] — the exact layout
the decode kernel consumes (ops/decode.py scales_arg) — so the hot decode
path does zero per-step scale reshapes (the round-2 [B, Hk, S, 1] layout
cost a broadcast+transpose+permute of the full scale tensor per layer per
step).  For fp8 caches whose capacity divides the packed-pair decode block
(ops/kv_append.PACKED_CHUNK), scales are additionally stored PRE-PERMUTED to
the packed decode's evens-then-odds lane order (``scale_perm_chunk``); the
decode kernel then reads them with zero shuffles.  Single-token decode
appends run the fused quantize+append Pallas kernel (ops/kv_append.py) —
in-place blocks, no quantized intermediates or fp32 scale tensors through
HBM.

Layout note: heads-major (BHSD) is the decode-optimal layout — the
flash-decode kernel consumes [Hk, bk, D] blocks with zero in-kernel
transposes (kv_layout='bhsd').  S_max is the padded capacity; attention
masks positions >= length.  A paged variant lives in engine/paged.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops.kv_append import PACKED_CHUNK, kv_append_token
from flash_attn_tpu.ops.quant import quantize_kv


def _tset(t: tuple, i: int, val) -> tuple:
    """Functional per-element tuple update."""
    return t[:i] + (val,) + t[i + 1:]


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # L x [B, Hk, S, D]
    v: tuple
    k_scale: tuple | None  # L x [B, Hk, 1, S] fp32 lane-dense
    v_scale: tuple | None
    length: jax.Array  # [B] int32
    mode: str = "none"
    # scales stored permuted to the packed-fp8 decode's lane order in
    # chunks of this size (None = natural position order)
    scale_perm_chunk: int | None = None

    def tree_flatten(self):
        return (
            (self.k, self.v, self.k_scale, self.v_scale, self.length),
            (self.mode, self.scale_perm_chunk),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux[0], scale_perm_chunk=aux[1])

    @property
    def num_layers(self):
        return len(self.k)

    @property
    def capacity(self):
        return self.k[0].shape[2]

    def scale_args(self) -> dict:
        """kwargs for flash_decode/flash_decode_chunk declaring this cache's
        stored scale layout (pass alongside k_scale/v_scale from layer())."""
        return {
            "scale_layout": "lanes",
            "scales_perm_chunk": self.scale_perm_chunk,
        }

    def _scale_lane(self, pos):
        """Map natural cache positions to stored scale lanes."""
        c = self.scale_perm_chunk
        if not c:
            return pos
        half = c // 2
        o = pos % c
        return (pos // c) * c + (o % 2) * half + o // 2

    @classmethod
    def create(cls, num_layers, batch, capacity, num_kv_heads, head_dim,
               dtype=jnp.bfloat16, mode: str = "none",
               scale_perm_chunk: int | None | str = "auto"):
        """scale_perm_chunk: 'auto' (default) pre-permutes fp8 scale lanes
        when capacity is a PACKED_CHUNK multiple; None forces natural order
        (required when the capacity axis is sharded into non-chunk-multiple
        pieces — the engine passes None for mesh-sharded caches)."""
        if mode == "int8":
            store_dtype = jnp.int8
        elif mode == "fp8":
            store_dtype = jnp.float8_e4m3fn
        elif mode == "none":
            store_dtype = dtype
        else:
            raise ValueError(f"unknown kv cache mode {mode!r}")
        if scale_perm_chunk == "auto":
            scale_perm_chunk = (
                PACKED_CHUNK
                if mode == "fp8" and capacity % PACKED_CHUNK == 0
                else None
            )
        if scale_perm_chunk and capacity % scale_perm_chunk:
            raise ValueError(
                f"capacity {capacity} not a multiple of scale_perm_chunk "
                f"{scale_perm_chunk}"
            )
        shape = (batch, num_kv_heads, capacity, head_dim)
        k = tuple(jnp.zeros(shape, store_dtype) for _ in range(num_layers))
        v = tuple(jnp.zeros(shape, store_dtype) for _ in range(num_layers))
        if mode == "none":
            ks = vs = None
            scale_perm_chunk = None
        else:
            sshape = (batch, num_kv_heads, 1, capacity)
            ks = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
            vs = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
        return cls(
            k, v, ks, vs, jnp.zeros((batch,), jnp.int32), mode,
            scale_perm_chunk,
        )

    def _scale_scatter(self, buf, s, start):
        """Write per-token scales s [B, T, Hk, 1] at natural positions
        start[b]..start[b]+T-1 into the lane-dense buffer [B, Hk, 1, S]
        (through the store permutation)."""
        bsz, t = s.shape[:2]
        lanes = self._scale_lane(start[:, None] + jnp.arange(t)[None])  # [B,T]
        return buf.at[jnp.arange(bsz)[:, None], :, :, lanes].set(
            s.astype(jnp.float32)
        )

    def append(self, layer: int, new_k: jax.Array, new_v: jax.Array) -> "KVCache":
        """Insert [B, T, Hk, D] new entries at position ``length`` (same T for
        all sequences; per-sequence positions differ via ``length``).
        Quantizes on append per (token, head). Does NOT advance length —
        call advance() once after all layers.

        T == 1 (the decode hot path) runs the fused quantize+append Pallas
        kernel: in-place cache blocks, quantization in VMEM, scale written
        straight to its (permuted) lane — no full-cache DUS fusions and no
        scale round-trips (ops/kv_append.py)."""
        if new_k.shape[1] == 1:
            ksl = None if self.k_scale is None else self.k_scale[layer]
            vsl = None if self.v_scale is None else self.v_scale[layer]
            k2, v2, ks2, vs2 = kv_append_token(
                self.k[layer], self.v[layer], ksl, vsl,
                jnp.swapaxes(new_k, 1, 2)[:, :, 0],  # [B, Hk, D]
                jnp.swapaxes(new_v, 1, 2)[:, :, 0],
                self.length, mode=self.mode,
                scale_perm_chunk=self.scale_perm_chunk,
            )
            k = _tset(self.k, layer, k2)
            v = _tset(self.v, layer, v2)
            ks_new = self.k_scale if ks2 is None else _tset(
                self.k_scale, layer, ks2
            )
            vs_new = self.v_scale if vs2 is None else _tset(
                self.v_scale, layer, vs2
            )
            return KVCache(
                k, v, ks_new, vs_new, self.length, self.mode,
                self.scale_perm_chunk,
            )

        kq, ks, vq, vs = quantize_kv(new_k, new_v, self.mode)

        def to_bhsd(x):  # [B, T, Hk, c] -> [B, Hk, T, c]
            return jnp.swapaxes(x, 1, 2)

        def upd(cache_layer, new):
            # cache_layer [B, Hk, S, c]; new [B, Hk, T, c]; start at length
            return jax.vmap(
                lambda c, n, st: jax.lax.dynamic_update_slice(c, n, (0, st, 0))
            )(cache_layer, new.astype(cache_layer.dtype), self.length)

        k = _tset(self.k, layer, upd(self.k[layer], to_bhsd(kq)))
        v = _tset(self.v, layer, upd(self.v[layer], to_bhsd(vq)))
        if self.mode == "none":
            ks_new, vs_new = self.k_scale, self.v_scale
        else:
            ks_new = _tset(
                self.k_scale, layer,
                self._scale_scatter(self.k_scale[layer], ks, self.length),
            )
            vs_new = _tset(
                self.v_scale, layer,
                self._scale_scatter(self.v_scale[layer], vs, self.length),
            )
        return KVCache(
            k, v, ks_new, vs_new, self.length, self.mode,
            self.scale_perm_chunk,
        )

    def advance(self, t: int | jax.Array) -> "KVCache":
        return KVCache(
            self.k, self.v, self.k_scale, self.v_scale, self.length + t,
            self.mode, self.scale_perm_chunk,
        )

    def insert_at(self, layer: int, slot, new_k, new_v, start) -> "KVCache":
        """Write one sequence's [T, Hk, D] entries at ``start`` of ``slot``
        (chunked-prefill write; quantizes on insert).  Does not touch
        ``length`` — the caller sets it when the chunk sequence is done."""
        kq, ks, vq, vs = quantize_kv(new_k, new_v, self.mode)

        def put(buf, new):
            # new [T, Hk, c] -> [1, Hk, T, c] at (slot, 0, start, 0)
            new = jnp.swapaxes(new, 0, 1)[None].astype(buf.dtype)
            return jax.lax.dynamic_update_slice(buf, new, (slot, 0, start, 0))

        k = _tset(self.k, layer, put(self.k[layer], kq))
        v = _tset(self.v, layer, put(self.v[layer], vq))
        ksn, vsn = self.k_scale, self.v_scale
        if self.mode != "none":
            t = new_k.shape[0]
            lanes = self._scale_lane(start + jnp.arange(t))  # [T]
            ksn = _tset(
                self.k_scale, layer,
                self.k_scale[layer].at[slot, :, :, lanes].set(
                    ks.astype(jnp.float32)
                ),
            )
            vsn = _tset(
                self.v_scale, layer,
                self.v_scale[layer].at[slot, :, :, lanes].set(
                    vs.astype(jnp.float32)
                ),
            )
        return KVCache(
            k, v, ksn, vsn, self.length, self.mode, self.scale_perm_chunk
        )

    def set_length(self, slot, value) -> "KVCache":
        return KVCache(
            self.k, self.v, self.k_scale, self.v_scale,
            self.length.at[slot].set(value), self.mode,
            self.scale_perm_chunk,
        )

    def slot_kv_float(self, layer: int, slot, dtype=jnp.bfloat16):
        """Dequantized [1, S_cap, Hk, D] views of one slot's cache (the
        chunked-prefill read path; decode uses the fused-dequant kernel
        instead)."""
        def get(buf, scale):
            x = jax.lax.dynamic_slice_in_dim(buf[layer], slot, 1, 0)
            xf = x.astype(jnp.float32)
            if scale is not None:
                s = jax.lax.dynamic_slice_in_dim(scale[layer], slot, 1, 0)
                if self.scale_perm_chunk:
                    from flash_attn_tpu.ops.decode import (
                        _depermute_scale_lanes,
                    )

                    s = _depermute_scale_lanes(s, self.scale_perm_chunk)
                xf = xf * jnp.swapaxes(s, 2, 3).astype(jnp.float32)
            return jnp.swapaxes(xf, 1, 2).astype(dtype)  # [1, S, Hk, D]

        return get(self.k, self.k_scale), get(self.v, self.v_scale)

    def layer(self, i: int):
        """(k, v, k_scale, v_scale) views for layer i — zero-copy references
        into the per-layer buffers.  k/v are BHSD; scales are lane-dense
        [B, Hk, 1, S] in this cache's stored order: feed flash_decode with
        kv_layout='bhsd' and **cache.scale_args()."""
        ks = None if self.k_scale is None else self.k_scale[i]
        vs = None if self.v_scale is None else self.v_scale[i]
        return self.k[i], self.v[i], ks, vs
