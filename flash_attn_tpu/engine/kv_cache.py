"""KV-cache state: per-layer contiguous caches with optional INT8/FP8
quantize-on-append (BASELINE.json north star: quantized KV with dequant fused
into the decode kernel — see ops/decode.py).

The cache is a pytree of PER-LAYER arrays:
  k, v:        L-tuples of [B, Hk, S_max, D]  (quantized dtype or model dtype)
  k_scale/...: L-tuples of [B, Hk, S_max, 1]  (fp32; None for mode='none')
  length:      [B] int32 — valid entries per sequence

Why per-layer tuples, not one stacked [L, B, Hk, S, D] buffer: the round-2
stacked layout forced `k[layer]` slices to feed each pallas_call, and XLA
materialised the whole 64 MB layer slab per layer per decode step (measured
~1 ms/layer of slice/DUS fusions in the r3 device trace — 2.5 ms/step vs
0.68 ms/step for per-layer arrays at the Llama-8B decode shape,
benchmarks/r3_layercache_probe.py).  With per-layer arrays, `layer(i)` is a
zero-copy reference and appends are in-place dynamic-update-slices on the
scan-carried buffers.

Layout note: heads-major (BHSD) is the decode-optimal layout — the
flash-decode kernel consumes [Hk, bk, D] blocks with zero in-kernel
transposes (kv_layout='bhsd').  S_max is the padded capacity; attention
masks positions >= length.  A paged variant lives in engine/paged.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops.quant import quantize_kv


def _tset(t: tuple, i: int, val) -> tuple:
    """Functional per-element tuple update."""
    return t[:i] + (val,) + t[i + 1:]


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # L x [B, Hk, S, D]
    v: tuple
    k_scale: tuple | None  # L x [B, Hk, S, 1] fp32
    v_scale: tuple | None
    length: jax.Array  # [B] int32
    mode: str = "none"

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), (self.mode,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux[0])

    @property
    def num_layers(self):
        return len(self.k)

    @property
    def capacity(self):
        return self.k[0].shape[2]

    @classmethod
    def create(cls, num_layers, batch, capacity, num_kv_heads, head_dim,
               dtype=jnp.bfloat16, mode: str = "none"):
        if mode == "int8":
            store_dtype = jnp.int8
        elif mode == "fp8":
            store_dtype = jnp.float8_e4m3fn
        elif mode == "none":
            store_dtype = dtype
        else:
            raise ValueError(f"unknown kv cache mode {mode!r}")
        shape = (batch, num_kv_heads, capacity, head_dim)
        k = tuple(jnp.zeros(shape, store_dtype) for _ in range(num_layers))
        v = tuple(jnp.zeros(shape, store_dtype) for _ in range(num_layers))
        if mode == "none":
            ks = vs = None
        else:
            sshape = shape[:-1] + (1,)
            ks = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
            vs = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
        return cls(k, v, ks, vs, jnp.zeros((batch,), jnp.int32), mode)

    def append(self, layer: int, new_k: jax.Array, new_v: jax.Array) -> "KVCache":
        """Insert [B, T, Hk, D] new entries at position ``length`` (same T for
        all sequences; per-sequence positions differ via ``length``).
        Quantizes on append per (token, head). Does NOT advance length —
        call advance() once after all layers."""
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
                self.k_scale, layer, upd(self.k_scale[layer], to_bhsd(ks))
            )
            vs_new = _tset(
                self.v_scale, layer, upd(self.v_scale[layer], to_bhsd(vs))
            )
        return KVCache(k, v, ks_new, vs_new, self.length, self.mode)

    def advance(self, t: int | jax.Array) -> "KVCache":
        return KVCache(
            self.k, self.v, self.k_scale, self.v_scale, self.length + t, self.mode
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
            ksn = _tset(self.k_scale, layer, put(self.k_scale[layer], ks))
            vsn = _tset(self.v_scale, layer, put(self.v_scale[layer], vs))
        return KVCache(k, v, ksn, vsn, self.length, self.mode)

    def set_length(self, slot, value) -> "KVCache":
        return KVCache(
            self.k, self.v, self.k_scale, self.v_scale,
            self.length.at[slot].set(value), self.mode,
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
                xf = xf * s.astype(jnp.float32)
            return jnp.swapaxes(xf, 1, 2).astype(dtype)  # [1, S, Hk, D]

        return get(self.k, self.k_scale), get(self.v, self.v_scale)

    def layer(self, i: int):
        """(k, v, k_scale, v_scale) BHSD views for layer i — zero-copy
        references into the per-layer buffers (feed to flash_decode with
        kv_layout='bhsd')."""
        ks = None if self.k_scale is None else self.k_scale[i]
        vs = None if self.v_scale is None else self.v_scale[i]
        return self.k[i], self.v[i], ks, vs
