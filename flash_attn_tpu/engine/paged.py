"""Paged KV-cache pool + paged decode attention (B6).

The pool holds fixed-size pages in the decode-optimal heads-major layout
[num_pages, Hk, page_size, D]; each sequence owns a row of the block table
[max_pages_per_seq] of page indices.  Pages are whole KV tiles (lane-aligned
(page, head_dim) granularity — SURVEY.md §7 hard part (d): TPU hates small
gathers), and decode runs the scalar-prefetch Pallas kernel
(ops/paged_decode.py) that DMAs pages directly by block-table index — no
materialising gather (the round-1 implementation copied the whole cache
through HBM per step; that path survives only as ``gather_layer``, the
correctness oracle).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.engine.kv_cache import _tset
from flash_attn_tpu.ops.paged_decode import paged_flash_decode
from flash_attn_tpu.ops.quant import quantize_kv


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVPool:
    """Per-layer paged pool. Page 0 is reserved as the null page.

    Pages are stored as PER-LAYER tuples (not one stacked [L, ...] array):
    the stacked layout forced a whole-pool slice per layer to feed each
    pallas_call (see engine/kv_cache.py for the measured cost)."""

    k_pages: tuple  # L x [num_pages, Hk, page, D]
    v_pages: tuple
    k_scale: tuple | None  # L x [num_pages, Hk, 1, page] (lane-dense)
    v_scale: tuple | None
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
        return self.k_pages[0].shape[2]

    @property
    def scales_permuted(self):
        """fp8 pools store per-position scales in the packed-pair decode's
        lane order — evens-then-odds within each page (see
        ops/decode._packed_e4m3_halves) — so the hot paged kernel reads
        them with zero per-step shuffles.  Appends permute the write
        offsets; the gather oracles unpermute on read."""
        return self.mode == "fp8" and self.page_size % 4 == 0

    def _scale_lane(self, offs):
        """Map natural in-page offsets to stored scale lanes."""
        if not self.scales_permuted:
            return offs
        half = self.page_size // 2
        return (offs % 2) * half + offs // 2

    def _scale_unperm_idx(self):
        """Lane gather index such that natural[p] = stored[idx[p]]."""
        import numpy as np

        page = self.page_size
        half = page // 2
        idx = np.empty((page,), np.int32)
        idx[0::2] = np.arange(half)
        idx[1::2] = half + np.arange(page - half)
        return jnp.asarray(idx)

    @property
    def num_pages(self):
        return self.k_pages[0].shape[0]

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
        shape = (num_pages, num_kv_heads, page_size, head_dim)
        k = tuple(jnp.zeros(shape, store) for _ in range(num_layers))
        v = tuple(jnp.zeros(shape, store) for _ in range(num_layers))
        if mode == "none":
            ks = vs = None
        else:
            sshape = (num_pages, num_kv_heads, 1, page_size)
            ks = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
            vs = tuple(jnp.ones(sshape, jnp.float32) for _ in range(num_layers))
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

    def set_lengths(self, lengths) -> "PagedKVPool":
        return self._replace(length=jnp.asarray(lengths, jnp.int32))

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
            # buf [num_pages, Hk, page, D]; new [B, Hk, D]
            return buf.at[pages, :, offset].set(new.astype(buf.dtype))

        def scatter_scale(buf, new):
            # buf [num_pages, Hk, 1, page]; new [B, Hk, 1]
            return buf.at[pages, :, 0, self._scale_lane(offset)].set(
                new[..., 0]
            )

        k_pages = _tset(self.k_pages, layer, scatter(self.k_pages[layer], kq))
        v_pages = _tset(self.v_pages, layer, scatter(self.v_pages[layer], vq))
        out = self._replace(k_pages=k_pages, v_pages=v_pages)
        if self.mode != "none":
            out = out._replace(
                k_scale=_tset(
                    self.k_scale, layer,
                    scatter_scale(self.k_scale[layer], ks),
                ),
                v_scale=_tset(
                    self.v_scale, layer,
                    scatter_scale(self.v_scale[layer], vs),
                ),
            )
        return out

    def append_prefill(self, layer: int, slot, new_k, new_v,
                       start) -> "PagedKVPool":
        """Write a whole prefill segment for one slot: new_k/new_v
        [T, Hk, D] at positions [start, start+T) of sequence ``slot``.
        T must be static; page-aligned chunks write fastest."""
        kq, ks, vq, vs = quantize_kv(new_k, new_v, self.mode)
        T = new_k.shape[0]
        page_size = self.page_size
        pos = start + jnp.arange(T)
        pages = self.block_table[slot, pos // page_size]  # [T]
        offs = pos % page_size

        def scatter(buf, new):
            # advanced indices (pages, offs) separated by the ':' slice land
            # in front: buf[pages, :, offs] is [T, Hk, D], matching new.
            return buf.at[pages, :, offs].set(new.astype(buf.dtype))

        def scatter_scale(buf, new):
            return buf.at[pages, :, 0, self._scale_lane(offs)].set(
                new[..., 0]
            )

        k_pages = _tset(self.k_pages, layer, scatter(self.k_pages[layer], kq))
        v_pages = _tset(self.v_pages, layer, scatter(self.v_pages[layer], vq))
        out = self._replace(k_pages=k_pages, v_pages=v_pages)
        if self.mode != "none":
            out = out._replace(
                k_scale=_tset(
                    self.k_scale, layer,
                    scatter_scale(self.k_scale[layer], ks),
                ),
                v_scale=_tset(
                    self.v_scale, layer,
                    scatter_scale(self.v_scale[layer], vs),
                ),
            )
        return out

    def advance(self, t=1) -> "PagedKVPool":
        return self._replace(length=self.length + t)

    def gather_slot(self, layer: int, slot, dtype=jnp.float32):
        """One slot's contiguous dequantized KV view [1, mp*page, Hk, D]
        (float) — correctness oracle / debug utility.  The suffix prefill
        used this in its first cut; it now streams pages directly via
        ops/paged_decode.paged_flash_decode_chunk."""
        table = self.block_table[slot]  # [mp]

        def g(buf):
            picked = buf[layer][table]  # [mp, Hk, page, D]
            moved = jnp.moveaxis(picked, 1, 2)  # [mp, page, Hk, D]
            return moved.reshape(-1, moved.shape[2], moved.shape[3])

        k, v = g(self.k_pages), g(self.v_pages)
        if self.mode != "none":
            def gs(buf):
                picked = buf[layer][table][:, :, 0, :]  # [mp, Hk, page]
                if self.scales_permuted:
                    picked = picked[..., self._scale_unperm_idx()]
                return jnp.moveaxis(picked, 1, 2).reshape(
                    -1, picked.shape[1]
                )[..., None]  # [mp*page, Hk, 1]

            k = k.astype(jnp.float32) * gs(self.k_scale)
            v = v.astype(jnp.float32) * gs(self.v_scale)
        return k.astype(dtype)[None], v.astype(dtype)[None]

    def gather_layer(self, layer: int):
        """Correctness oracle: materialise contiguous [B, max_pages*page,
        Hk, D] views (the round-1 XLA-gather path — O(cache) HBM traffic,
        do not use on the hot path)."""
        def g(buf):
            picked = buf[layer][self.block_table]  # [B, mp, Hk, page, D]
            b, mp = picked.shape[:2]
            moved = jnp.moveaxis(picked, 2, 3)  # [B, mp, page, Hk, D]
            return moved.reshape(b, mp * moved.shape[2], *moved.shape[3:])

        def gs(buf):
            picked = buf[layer][self.block_table]  # [B, mp, Hk, 1, page]
            if self.scales_permuted:
                picked = picked[..., self._scale_unperm_idx()]
            b, mp = picked.shape[:2]
            moved = jnp.moveaxis(picked[:, :, :, 0, :], 3, 2)  # [B,mp,page,Hk]
            return moved.reshape(b, mp * moved.shape[2], moved.shape[3], 1)

        ks = None if self.k_scale is None else gs(self.k_scale)
        vs = None if self.v_scale is None else gs(self.v_scale)
        return g(self.k_pages), g(self.v_pages), ks, vs


def paged_decode_attention(pool: PagedKVPool, layer: int, q, *, scale=None,
                           interpret=None, window=None,
                           softmax_mode=None, logit_softcap=None):
    """q [B, H, D] -> out [B, H, D] attending to the paged cache via the
    scalar-prefetch kernel (no gather)."""
    return paged_flash_decode(
        q,
        pool.k_pages[layer],
        pool.v_pages[layer],
        pool.block_table,
        pool.length,
        k_scale=None if pool.k_scale is None else pool.k_scale[layer],
        v_scale=None if pool.v_scale is None else pool.v_scale[layer],
        scale=scale,
        interpret=interpret,
        window=window,
        softmax_mode=softmax_mode,
        logit_softcap=logit_softcap,
        scales_permuted=pool.scales_permuted,
    )
