"""Paged KV-cache pool + paged decode attention (B6).

The pool holds fixed-size pages [num_pages, page_size, Hk, D]; each sequence
owns a row of the block table [max_pages_per_seq] of page indices.  Pages are
sized to the decode kernel's KV tile (>= lane-aligned (page, head_dim)
granularity — SURVEY.md §7 hard part (d): TPU hates small gathers), so the
decode kernel can DMA whole pages via the block table without host gathers.

Round-1 implementation: the gather is a vectorised jnp take (XLA dynamic
gather, fused) feeding the flash_decode kernel; a scalar-prefetch Pallas
kernel that DMAs pages directly by table index is the planned upgrade.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops.decode import flash_decode
from flash_attn_tpu.ops.quant import quantize_kv


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVPool:
    """Per-layer paged pool. Page 0 is reserved as the null page."""

    k_pages: jax.Array  # [L, num_pages, page, Hk, D]
    v_pages: jax.Array
    k_scale: jax.Array | None  # [L, num_pages, page, Hk, 1]
    v_scale: jax.Array | None
    block_table: jax.Array  # [B, max_pages] int32 page ids (0 = unassigned)
    length: jax.Array  # [B] int32 tokens in cache
    mode: str = "none"

    def tree_flatten(self):
        return (
            self.k_pages, self.v_pages, self.k_scale, self.v_scale,
            self.block_table, self.length,
        ), (self.mode,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux[0])

    @property
    def page_size(self):
        return self.k_pages.shape[2]

    @property
    def num_pages(self):
        return self.k_pages.shape[1]

    @property
    def max_pages(self):
        return self.block_table.shape[1]

    @classmethod
    def create(cls, num_layers, num_pages, page_size, batch, max_pages,
               num_kv_heads, head_dim, dtype=jnp.bfloat16, mode="none"):
        if mode == "int8":
            store = jnp.int8
        elif mode == "fp8":
            store = jnp.float8_e4m3fn
        else:
            store = dtype
        shape = (num_layers, num_pages, page_size, num_kv_heads, head_dim)
        k = jnp.zeros(shape, store)
        v = jnp.zeros(shape, store)
        if mode == "none":
            ks = vs = None
        else:
            ks = jnp.ones(shape[:-1] + (1,), jnp.float32)
            vs = jnp.ones(shape[:-1] + (1,), jnp.float32)
        return cls(
            k, v, ks, vs,
            jnp.zeros((batch, max_pages), jnp.int32),
            jnp.zeros((batch,), jnp.int32),
            mode,
        )

    # -- host-side allocation (the scheduler owns the free list) --

    def assign_pages(self, seq_slot: int, page_ids) -> "PagedKVPool":
        """Host-side: install page ids for a sequence slot."""
        table = self.block_table.at[seq_slot, : len(page_ids)].set(
            jnp.asarray(page_ids, jnp.int32)
        )
        return self._replace(block_table=table)

    def _replace(self, **kw):
        d = dict(
            k_pages=self.k_pages, v_pages=self.v_pages, k_scale=self.k_scale,
            v_scale=self.v_scale, block_table=self.block_table,
            length=self.length, mode=self.mode,
        )
        d.update(kw)
        return PagedKVPool(**d)

    # -- device-side ops --

    def append_token(self, layer: int, new_k, new_v) -> "PagedKVPool":
        """Write one token per sequence: new_k/new_v [B, Hk, D] at position
        ``length`` of each sequence (page = table[length // page], offset =
        length % page)."""
        kq, ks, vq, vs = quantize_kv(new_k, new_v, self.mode)
        page_size = self.page_size
        page_idx = self.length // page_size
        offset = self.length % page_size
        pages = jax.vmap(lambda t, i: t[i])(self.block_table, page_idx)  # [B]

        def scatter(buf, new):
            # buf [num_pages, page, Hk, D(or 1)]; new [B, Hk, D]
            return buf.at[pages, offset].set(new.astype(buf.dtype))

        k_pages = self.k_pages.at[layer].set(scatter(self.k_pages[layer], kq))
        v_pages = self.v_pages.at[layer].set(scatter(self.v_pages[layer], vq))
        out = self._replace(k_pages=k_pages, v_pages=v_pages)
        if self.mode != "none":
            out = out._replace(
                k_scale=self.k_scale.at[layer].set(scatter(self.k_scale[layer], ks)),
                v_scale=self.v_scale.at[layer].set(scatter(self.v_scale[layer], vs)),
            )
        return out

    def advance(self, t=1) -> "PagedKVPool":
        return self._replace(length=self.length + t)

    def gather_layer(self, layer: int):
        """Materialise contiguous [B, max_pages*page, Hk, D] views for the
        decode kernel (XLA gather; fused with the kernel's consumption)."""
        def g(buf):
            picked = buf[layer][self.block_table]  # [B, max_pages, page, Hk, D]
            b, mp, ps = picked.shape[:3]
            return picked.reshape(b, mp * ps, *picked.shape[3:])

        ks = None if self.k_scale is None else g(self.k_scale)
        vs = None if self.v_scale is None else g(self.v_scale)
        return g(self.k_pages), g(self.v_pages), ks, vs


def paged_decode_attention(pool: PagedKVPool, layer: int, q, *, scale=None,
                           interpret=None):
    """q [B, H, D] -> out [B, H, D] attending to the paged cache."""
    k, v, ks, vs = pool.gather_layer(layer)
    return flash_decode(
        q, k, v, k_scale=ks, v_scale=vs, kv_length=pool.length,
        scale=scale, interpret=interpret,
    )
