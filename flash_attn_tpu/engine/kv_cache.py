"""KV-cache state: contiguous per-layer cache with optional INT8/FP8
quantize-on-append (BASELINE.json north star: quantized KV with dequant fused
into the decode kernel — see ops/decode.py).

The cache is a pytree of arrays, so it jits/shards/donates cleanly:
  k, v:        [L, B, Hk, S_max, D]   (quantized dtype or model dtype)
  k_scale/...: [L, B, Hk, S_max, 1]   (fp32; absent for mode='none')
  length:      [B] int32 — valid entries per sequence

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


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None
    v_scale: jax.Array | None
    length: jax.Array  # [B] int32
    mode: str = "none"

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), (self.mode,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux[0])

    @property
    def num_layers(self):
        return self.k.shape[0]

    @property
    def capacity(self):
        return self.k.shape[3]

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
        shape = (num_layers, batch, num_kv_heads, capacity, head_dim)
        k = jnp.zeros(shape, store_dtype)
        v = jnp.zeros(shape, store_dtype)
        if mode == "none":
            ks = vs = None
        else:
            ks = jnp.ones(shape[:-1] + (1,), jnp.float32)
            vs = jnp.ones(shape[:-1] + (1,), jnp.float32)
        return cls(k, v, ks, vs, jnp.zeros((batch,), jnp.int32), mode)

    def append(self, layer: int, new_k: jax.Array, new_v: jax.Array) -> "KVCache":
        """Insert [B, T, Hk, D] new entries at position ``length`` (same T for
        all sequences; per-sequence positions differ via ``length``).
        Quantizes on append per (token, head). Does NOT advance length —
        call advance() once after all layers."""
        kq, ks, vq, vs = quantize_kv(new_k, new_v, self.mode)

        def to_bhsd(x):  # [B, T, Hk, c] -> [B, Hk, T, c]
            return jnp.swapaxes(x, 1, 2)

        kq = to_bhsd(kq).astype(self.k.dtype)
        vq = to_bhsd(vq).astype(self.v.dtype)

        def upd(cache_layer, new):
            # cache_layer [B, Hk, S, c]; new [B, Hk, T, c]; start at length
            return jax.vmap(
                lambda c, n, st: jax.lax.dynamic_update_slice(c, n, (0, st, 0))
            )(cache_layer, new, self.length)

        k = self.k.at[layer].set(upd(self.k[layer], kq))
        v = self.v.at[layer].set(upd(self.v[layer], vq))
        if self.mode == "none":
            ks_new, vs_new = self.k_scale, self.v_scale
        else:
            ks_new = self.k_scale.at[layer].set(
                upd(self.k_scale[layer], to_bhsd(ks))
            )
            vs_new = self.v_scale.at[layer].set(
                upd(self.v_scale[layer], to_bhsd(vs))
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
            # new [T, Hk, c] -> [1, 1, Hk, T, c] at (layer, slot, 0, start, 0)
            new = jnp.swapaxes(new, 0, 1)[None, None].astype(buf.dtype)
            return jax.lax.dynamic_update_slice(
                buf, new, (layer, slot, 0, start, 0)
            )

        k = put(self.k, kq)
        v = put(self.v, vq)
        ksn, vsn = self.k_scale, self.v_scale
        if self.mode != "none":
            ksn = put(self.k_scale, ks)
            vsn = put(self.v_scale, vs)
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
        """(k, v, k_scale, v_scale) BHSD views for layer i (feed to
        flash_decode with kv_layout='bhsd')."""
        ks = None if self.k_scale is None else self.k_scale[i]
        vs = None if self.v_scale is None else self.v_scale[i]
        return self.k[i], self.v[i], ks, vs
