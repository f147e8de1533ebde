"""Llama-3 in pure JAX: RMSNorm + RoPE + GQA + SwiGLU, flash-attention core,
optional INT8/INT4 weight-only projections (B11; BASELINE.json configs 1-4).

Param pytree layout (per block): wq/wk/wv/wo, w_gate/w_up/w_down,
attn_norm/mlp_norm; top level: tok_emb, final_norm, lm_head.  Weights may be
plain arrays, (int8, scales) tuples, or Int4Weight — every projection goes
through ops/matmul.quantized_matmul, which dispatches on type.

TP sharding specs for this pytree live in parallel/tp.py; the decode path
reads the quantized KV cache through the flash-decode kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.decode import flash_decode, flash_decode_chunk
from flash_attn_tpu.ops.matmul import quantized_matmul


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden: int = 4096
    intermediate: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    max_position: int = 8192
    dtype: str = "bfloat16"
    tie_embeddings: bool = False
    # Mistral-style sliding-window attention (None = global); honored by
    # forward/prefill (fwd-kernel window mask) and cached decode.
    sliding_window: int | None = None
    # Gemma-2-style attention logit softcapping, cap * tanh(s / cap)
    # (None = off); honored in-kernel on every attention path.
    attn_logit_softcap: float | None = None
    # Qwen-2-style bias on the q/k/v projections: wq/wk/wv become
    # ops/matmul.BiasedWeight nodes (any inner weight kind + bias [N]);
    # quantized_matmul unwraps transparently on every path.
    qkv_bias: bool = False


LLAMA3_8B = LlamaConfig()
LLAMA3_70B = LlamaConfig(
    hidden=8192, intermediate=28672, num_layers=80, num_heads=64, num_kv_heads=8
)
QWEN2_7B = LlamaConfig(
    vocab_size=152064, hidden=3584, intermediate=18944, num_layers=28,
    num_heads=28, num_kv_heads=4, head_dim=128, rope_theta=1000000.0,
    rms_eps=1e-6, max_position=32768, qkv_bias=True,
)
LLAMA_TINY = LlamaConfig(
    vocab_size=512, hidden=128, intermediate=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_position=256,
    rope_theta=10000.0, dtype="float32",
)


def init_params(cfg: LlamaConfig, key) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(
        key, 3 + (10 if cfg.qkv_bias else 7) * cfg.num_layers
    ))

    def w(kin, kout, scale=0.02):
        return jax.random.normal(next(keys), (kin, kout), dtype) * scale

    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    def maybe_bias(weight, n):
        if not cfg.qkv_bias:
            return weight
        from flash_attn_tpu.ops.matmul import BiasedWeight

        return BiasedWeight(
            weight, jax.random.normal(next(keys), (n,), dtype) * 0.02
        )

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "attn_norm": jnp.ones((cfg.hidden,), dtype),
            "wq": maybe_bias(w(cfg.hidden, q_dim), q_dim),
            "wk": maybe_bias(w(cfg.hidden, kv_dim), kv_dim),
            "wv": maybe_bias(w(cfg.hidden, kv_dim), kv_dim),
            "wo": w(q_dim, cfg.hidden),
            "mlp_norm": jnp.ones((cfg.hidden,), dtype),
            "w_gate": w(cfg.hidden, cfg.intermediate),
            "w_up": w(cfg.hidden, cfg.intermediate),
            "w_down": w(cfg.intermediate, cfg.hidden),
        })
    return {
        "tok_emb": w(cfg.vocab_size, cfg.hidden),
        "blocks": blocks,
        "final_norm": jnp.ones((cfg.hidden,), dtype),
        "lm_head": w(cfg.hidden, cfg.vocab_size),
    }


def _rms_norm(x, g, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)).astype(x.dtype)


# Shared RoPE math (ops/rope.py); prefill paths pass q UN-rotated to
# flash_attention with rope_cos/rope_sin so the rotation happens inside the
# kernel at block-load time (saves the [B,S,H,D] rotated-q HBM round trip);
# K is rotated here because its rotated form is what the KV cache stores.
from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate as apply_rope


def _proj(x, w, interpret=None):
    """Matmul dispatching on weight kind ([..., K] x quantized/float [K, N])."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = quantized_matmul(x2, w, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _wnd(cfg):
    return (
        None if cfg.sliding_window is None else (cfg.sliding_window - 1, -1)
    )


def _proj_l(x, blk, lblk, name, interpret, ids=None, scaling=1.0):
    """Projection + optional LoRA delta (models/lora.py): the base weight
    stays one MXU matmul (quantized or float); the per-slot adapter adds
    two thin rank-r contractions."""
    y = _proj(x, blk[name], interpret)
    if lblk is not None and name in lblk:
        from flash_attn_tpu.models.lora import lora_delta

        y = y + lora_delta(x, lblk[name], ids, scaling).astype(y.dtype)
    return y


def _qkv_proj(h, blk, cfg, interpret, lblk=None, ids=None, lsc=1.0):
    """q/k/v projections, fused into ONE matmul when the block carries a
    ``wqkv`` weight (fuse_projections): the composed decode step pays a
    fixed cost per pallas_call, so one [K, q+2kv] call beats three.
    Returns (q [..., q_dim], k [..., kv_dim], v [..., kv_dim]) unreshaped;
    LoRA deltas (per-name adapters) apply to the split outputs."""
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    if "wqkv" in blk:
        y = _proj(h, blk["wqkv"], interpret)
        q = y[..., :q_dim]
        k = y[..., q_dim : q_dim + kv_dim]
        v = y[..., q_dim + kv_dim :]
        if lblk is not None:
            from flash_attn_tpu.models.lora import lora_delta

            def _add(part, name):
                if name not in lblk:
                    return part
                return part + lora_delta(h, lblk[name], ids, lsc).astype(
                    part.dtype
                )

            q, k, v = _add(q, "wq"), _add(k, "wk"), _add(v, "wv")
        return q, k, v
    return (
        _proj_l(h, blk, lblk, "wq", interpret, ids, lsc),
        _proj_l(h, blk, lblk, "wk", interpret, ids, lsc),
        _proj_l(h, blk, lblk, "wv", interpret, ids, lsc),
    )


def _block_attn(x, blk, cfg, cos, sin, *, cache=None, layer=None,
                segment_ids=None, interpret=None):
    """Shared attention sub-block for prefill/forward (full-seq causal)."""
    b, s, _ = x.shape
    h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
    q, k, v = _qkv_proj(h, blk, cfg, interpret)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    k = apply_rope(k, cos, sin)
    if cache is not None:
        cache = cache.append(layer, k, v)
    attn = flash_attention(
        q, k, v, causal=True, window=_wnd(cfg), logit_softcap=cfg.attn_logit_softcap,
        q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
        rope_cos=cos, rope_sin=sin,
        interpret=interpret,
    )
    out = _proj(attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk["wo"], interpret)
    return x + out, cache


def _block_mlp(x, blk, cfg, interpret=None, lblk=None, lora_ids=None,
               lora_scaling=1.0):
    h = _rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
    if "w_gate_up" in blk:
        y = _proj(h, blk["w_gate_up"], interpret)
        gate = y[..., : cfg.intermediate]
        up = y[..., cfg.intermediate :]
        if lblk is not None:
            from flash_attn_tpu.models.lora import lora_delta

            if "w_gate" in lblk:
                gate = gate + lora_delta(
                    h, lblk["w_gate"], lora_ids, lora_scaling
                ).astype(gate.dtype)
            if "w_up" in lblk:
                up = up + lora_delta(
                    h, lblk["w_up"], lora_ids, lora_scaling
                ).astype(up.dtype)
    else:
        gate = _proj_l(h, blk, lblk, "w_gate", interpret, lora_ids,
                       lora_scaling)
        up = _proj_l(h, blk, lblk, "w_up", interpret, lora_ids, lora_scaling)
    act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    return x + _proj_l(act.astype(x.dtype), blk, lblk, "w_down", interpret,
                       lora_ids, lora_scaling)


def forward(params, tokens, cfg: LlamaConfig, *, positions=None,
            segment_ids=None, interpret=None):
    """tokens [B, S] -> logits [B, S, V] (training/prefill, causal)."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    for blk in params["blocks"]:
        x, _ = _block_attn(
            x, blk, cfg, cos, sin, segment_ids=segment_ids, interpret=interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return _proj(x.astype(jnp.float32), head, interpret)


def prefill_with_kv(params, tokens, positions, cfg: LlamaConfig, *, interpret=None,
                    lora=None, lora_id=None):
    """Engine adapter path: logits [1,S,V] + per-layer rope'd KV.

    lora: optional LoRA tree or stacked bank; with a bank, scalar
    ``lora_id`` selects the adapter for this (single-request) prefill."""
    b, s = tokens.shape
    lsc = lora["scaling"] if lora is not None else 1.0
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    kvs = []
    for i, blk in enumerate(params["blocks"]):
        lblk = lora["blocks"][i] if lora is not None else None
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret, lblk, lora_id, lsc)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)
        kvs.append((k, v))
        # inference-only path: clamped softmax (no running max; exact for
        # in-contract scores — see FlashConfig.softmax_mode) is ~22% faster
        # at the 8B prefill shape.  Training (forward/_block_attn) keeps
        # the online default.
        attn = flash_attention(q, k, v, causal=True, window=_wnd(cfg), logit_softcap=cfg.attn_logit_softcap,
                               rope_cos=cos, rope_sin=sin,
                               softmax_mode="clamped",
                               interpret=interpret)
        x = x + _proj_l(
            attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk, lblk,
            "wo", interpret, lora_id, lsc,
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret, lblk=lblk,
                       lora_ids=lora_id, lora_scaling=lsc)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return _proj(x.astype(jnp.float32), head, interpret), kvs


def prefill_chunk(params, tokens, cfg: LlamaConfig, cache: KVCache, slot,
                  start, *, interpret=None):
    """Chunked prefill (see models/gpt2.py prefill_chunk): chunk tokens
    [1, C] at positions [start, start+C) of ``slot``; attends to the cached
    prefix + chunk via the in-kernel positions mask."""
    b, c = tokens.shape
    cap = cache.capacity
    x = params["tok_emb"][tokens]
    qpos = (start + jnp.arange(c))[None]
    kvpos = jnp.arange(cap)[None]
    cos, sin = rope_cos_sin(qpos, cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret)
        q = q.reshape(b, c, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, c, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, c, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)  # cache stores post-rope K
        cache = cache.insert_at(i, slot, k[0], v[0], start)
        kc, vc = cache.slot_kv_float(i, slot, dtype=x.dtype)
        attn = flash_attention(
            q, kc, vc, q_positions=qpos, kv_positions=kvpos,
            window=_wnd(cfg), logit_softcap=cfg.attn_logit_softcap, rope_cos=cos, rope_sin=sin,
            softmax_mode="clamped",
            interpret=interpret,
        )
        x = x + _proj(
            attn.reshape(b, c, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return _proj(x.astype(jnp.float32), head, interpret), cache


def prefill_suffix_paged(params, tokens, cfg: LlamaConfig, pool, slot,
                         start, *, interpret=None, sub_chunk: int = 128):
    """Prefix-cache suffix prefill (engine/prefix_cache.py): chunk tokens
    [1, C] at positions [start, start+C) of paged-pool ``slot``, whose
    positions [0, start) are already resident (shared prefix pages).
    Per layer: append the chunk's KV to the pool, then attend the chunk's
    queries straight against the slot's pages with the paged chunk kernel
    (ops/paged_decode.paged_flash_decode_chunk) — no gather, the prefix KV
    streams from its pages exactly once.  The suffix is processed in
    ``sub_chunk``-token pieces (each piece through all layers before the
    next) so the kernel's virtual-head scratch stays inside VMEM.

    Returns (logits [1, C, V], pool).
    """
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode_chunk

    b, c = tokens.shape

    def one_chunk(toks_cc, start_cc, pool):
        cc = toks_cc.shape[1]
        x = params["tok_emb"][toks_cc]
        qpos = (start_cc + jnp.arange(cc))[None]
        cos, sin = rope_cos_sin(qpos, cfg.head_dim, cfg.rope_theta)
        kv_len = jnp.reshape(start_cc + cc, (1,))  # includes this chunk
        table = pool.block_table[slot][None]
        for i, blk in enumerate(params["blocks"]):
            h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
            q, k, v = _qkv_proj(h, blk, cfg, interpret)
            q = q.reshape(b, cc, cfg.num_heads, cfg.head_dim)
            k = k.reshape(b, cc, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(b, cc, cfg.num_kv_heads, cfg.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)  # pool stores post-rope K
            pool = pool.append_prefill(i, slot, k[0], v[0], start_cc)
            attn = paged_flash_decode_chunk(
                q, pool.k_pages[i], pool.v_pages[i], table, kv_len,
                k_scale=None if pool.k_scale is None else pool.k_scale[i],
                v_scale=None if pool.v_scale is None else pool.v_scale[i],
                interpret=interpret, window=cfg.sliding_window,
            logit_softcap=cfg.attn_logit_softcap,
                scales_permuted=pool.scales_permuted,
            )
            x = x + _proj(
                attn.reshape(b, cc, cfg.num_heads * cfg.head_dim),
                blk["wo"], interpret,
            )
            x = _block_mlp(x, blk, cfg, interpret=interpret)
        x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
        head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
        return _proj(x.astype(jnp.float32), head, interpret), pool

    parts = []
    for off in range(0, c, sub_chunk):
        cc = min(sub_chunk, c - off)
        logits_cc, pool = one_chunk(tokens[:, off:off + cc], start + off, pool)
        parts.append(logits_cc)
    logits = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return logits, pool


def prefill_packed(params, tokens, positions, segment_ids, cfg: LlamaConfig,
                   *, interpret=None):
    """Packed multi-prompt prefill (varlen, flash_attn.h:38-66 engine-side):
    several prompts concatenated in one [1, T] call; per-sequence causality
    via in-kernel segment ids + positions (positions restart at 0 per
    segment — also exactly what rope needs).  Returns (logits [1, T, V],
    kvs [(k, v) [1, T, Hk, D] per layer])."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    kvs = []
    for blk in params["blocks"]:
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)
        kvs.append((k, v))
        attn = flash_attention(
            q, k, v, window=_wnd(cfg), logit_softcap=cfg.attn_logit_softcap,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            q_positions=positions, kv_positions=positions,
            rope_cos=cos, rope_sin=sin,
            softmax_mode="clamped",
            interpret=interpret,
        )
        x = x + _proj(
            attn.reshape(b, t, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return _proj(x.astype(jnp.float32), head, interpret), kvs


def decode_step(params, token, cfg: LlamaConfig, cache: KVCache, *, interpret=None,
                lora=None, lora_ids=None):
    """One cached decode step: token [B] -> (logits [B, V], cache).

    lora: optional LoRA tree or stacked bank (models/lora.py); with a bank,
    lora_ids [B] selects each slot's adapter (multi-adapter serving)."""
    b = token.shape[0]
    lsc = lora["scaling"] if lora is not None else 1.0
    x = params["tok_emb"][token][:, None, :]  # [B, 1, H]
    cos, sin = rope_cos_sin(cache.length[:, None], cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        lblk = lora["blocks"][i] if lora is not None else None
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret, lblk, lora_ids, lsc)
        q = q.reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode(
            q[:, 0], kc, vc, k_scale=ks, v_scale=vs,
            kv_length=cache.length + 1, kv_layout="bhsd", interpret=interpret,
            window=cfg.sliding_window,
            logit_softcap=cfg.attn_logit_softcap, **cache.scale_args(),
        )
        x = x + _proj_l(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk, lblk,
            "wo", interpret, lora_ids, lsc,
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret, lblk=lblk,
                       lora_ids=lora_ids, lora_scaling=lsc)
    cache = cache.advance(1)
    x = _rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = _proj(x.astype(jnp.float32), head, interpret)
    return logits, cache


def decode_multi(params, tokens, cfg: LlamaConfig, cache: KVCache, *,
                 interpret=None):
    """T cached decode tokens per sequence in ONE pass: tokens [B, T] ->
    (logits [B, T, V], cache).  The speculative-decoding verify step — the
    chunk's KV is appended first, then all T positions are scored against
    the cache through flash_decode_chunk (one cache sweep for T tokens,
    causal within the chunk)."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens]  # [B, T, hidden]
    pos = cache.length[:, None] + jnp.arange(t)[None]  # [B, T]
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode_chunk(
            q, kc, vc, k_scale=ks, v_scale=vs, kv_length=cache.length + t,
            kv_layout="bhsd", interpret=interpret, window=cfg.sliding_window,
            logit_softcap=cfg.attn_logit_softcap, **cache.scale_args(),
        )
        x = x + _proj(
            attn.reshape(b, t, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    cache = cache.advance(t)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = _proj(x.astype(jnp.float32), head, interpret)
    return logits, cache


def decode_step_sharded(params, token, cfg: LlamaConfig, cache: KVCache,
                        mesh, *, axis_name="sp", interpret=None):
    """One cached decode step with the KV cache SEQUENCE-SHARDED over the
    mesh (BASELINE configs 3-4: long-context decode with the cache split
    across chips/hosts).  Per layer: each device runs flash_decode on its
    local [B, Hk, S_loc, D] shard, partials merge with one psum round
    (parallel/sharded_decode.py lse merge); params/activations are
    replicated here — compose with TP sharding of params for 2-D meshes."""
    from flash_attn_tpu.parallel.sharded_decode import (
        make_sharded_decode, shard_lengths,
    )

    n_shards = mesh.shape[axis_name]
    cap = cache.capacity
    assert cap % n_shards == 0, (cap, n_shards)
    if cache.scale_perm_chunk and (cap // n_shards) % cache.scale_perm_chunk:
        raise ValueError(
            "permuted scale chunks straddle shard boundaries: create the "
            "cache with scale_perm_chunk=None for sequence-sharded decode"
        )
    quantized = cache.mode != "none"
    dec = make_sharded_decode(
        mesh, axis_name=axis_name, interpret=interpret,
        quantized=quantized, kv_layout="bhsd",
        scale_layout="lanes", scales_perm_chunk=cache.scale_perm_chunk,
    )

    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]  # [B, 1, H]
    cos, sin = rope_cos_sin(cache.length[:, None], cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret)
        q = q.reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        lens = shard_lengths(cache.length + 1, n_shards, cap // n_shards)
        if quantized:
            attn = dec(q[:, 0], kc, vc, ks, vs, lens)
        else:
            attn = dec(q[:, 0], kc, vc, lens)
        x = x + _proj(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    cache = cache.advance(1)
    x = _rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = _proj(x.astype(jnp.float32), head, interpret)
    return logits, cache


def decode_step_paged(params, token, cfg: LlamaConfig, pool, *, interpret=None):
    """One decode step against a PagedKVPool (scalar-prefetch paged kernel)."""
    from flash_attn_tpu.engine.paged import paged_decode_attention

    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]
    cos, sin = rope_cos_sin(pool.length[:, None], cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, interpret)
        q = q.reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        pool = pool.append_token(i, k[:, 0], v[:, 0])
        attn = paged_decode_attention(
            pool.advance(1), i, q[:, 0], interpret=interpret,
            window=cfg.sliding_window,
            logit_softcap=cfg.attn_logit_softcap,
        )
        x = x + _proj(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    pool = pool.advance(1)
    x = _rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = _proj(x.astype(jnp.float32), head, interpret)
    return logits, pool


def make_cache(cfg: LlamaConfig, batch, capacity, mode="none", dtype=None):
    return KVCache.create(
        cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.dtype(dtype or cfg.dtype), mode=mode,
    )


def make_adapter(cfg: LlamaConfig, *, interpret=None, eos_token=None,
                 mesh=None, kv_shard_axis="sp"):
    """Engine adapter.  With ``mesh``, decode runs the sequence-sharded
    path (decode_step_sharded) — pass the same mesh to InferenceEngine so
    the cache is placed with its capacity axis sharded."""
    from flash_attn_tpu.engine.engine import ModelAdapter

    if mesh is not None:
        dec = lambda p, tok, cache: decode_step_sharded(  # noqa: E731
            p, tok, cfg, cache, mesh, axis_name=kv_shard_axis,
            interpret=interpret,
        )
    else:
        dec = lambda p, tok, cache: decode_step(  # noqa: E731
            p, tok, cfg, cache, interpret=interpret
        )

    return ModelAdapter(
        prefill_with_kv=lambda p, t, pos: prefill_with_kv(
            p, t, pos, cfg, interpret=interpret
        ),
        decode_step=dec,
        decode_multi=lambda p, toks, cache: decode_multi(
            p, toks, cfg, cache, interpret=interpret
        ),
        prefill_chunk=lambda p, t, cache, slot, start: prefill_chunk(
            p, t, cfg, cache, slot, start, interpret=interpret
        ),
        decode_step_paged=lambda p, tok, pool: decode_step_paged(
            p, tok, cfg, pool, interpret=interpret
        ),
        prefill_packed=lambda p, t, pos, seg: prefill_packed(
            p, t, pos, seg, cfg, interpret=interpret
        ),
        prefill_suffix_paged=lambda p, t, pool, slot, start: (
            prefill_suffix_paged(
                p, t, cfg, pool, slot, start, interpret=interpret
            )
        ),
        prefill_with_kv_lora=lambda p, t, pos, bank, aid: prefill_with_kv(
            p, t, pos, cfg, interpret=interpret, lora=bank, lora_id=aid
        ),
        decode_step_lora=lambda p, tok, cache, bank, ids: decode_step(
            p, tok, cfg, cache, interpret=interpret, lora=bank, lora_ids=ids
        ),
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        eos_token=eos_token,
    )


def quantize_weights(params, mode: str = "int8", group_size: int = 128,
                     skip=("tok_emb", "lm_head"), head_mode: str | None = None):
    """Weight-only quantization of every projection matrix (B7 wiring).

    mode: 'int8' (per-column scales), 'int4' (grouped Int4Weight),
    'w8a8' (native int8 MXU with dynamic activation quant), or 'w4a8'
    (int4-packed weights on the native int8 MXU).  Embeddings /
    head stay float by default.  head_mode overrides ``mode`` for the LM
    head only (when 'lm_head' is not in skip): the head is the one
    large-N matmul in the decode step, where w8a8's cast-free streaming
    wins (298 -> 202 us at 8B dims, docs/BENCHMARKS.md r4) while the
    layer weights may prefer a different scheme.
    """
    from flash_attn_tpu.ops.matmul import BiasedWeight
    from flash_attn_tpu.ops.quant import quantize_int4, quantize_int8

    def quant(w, mode=mode):
        if isinstance(w, BiasedWeight):
            return BiasedWeight(quant(w.w, mode), w.bias)
        if mode == "int8":
            vals, scale = quantize_int8(w, axes=(0,))
            return (vals, scale[0])
        if mode == "w8a8":
            # same stored weights as int8, but matmul runs native int8xint8
            # MXU with per-token dynamic activation quant (ops/matmul.py)
            from flash_attn_tpu.ops.matmul import W8A8Weight

            vals, scale = quantize_int8(w, axes=(0,))
            return W8A8Weight(vals, scale[0])
        if mode == "int4":
            return quantize_int4(w, group_size=group_size)
        if mode == "w4a8":
            # same packed int4 nibbles as 'int4' (halves layout), but the
            # matmul decodes them to int8 planes (3 VPU ops / 4 bytes) and
            # runs the native s8 x s8 MXU with per-token dynamic
            # activation quant — full weight-streaming speed at int4 bytes
            # (ops/matmul.matmul_w4a8)
            from flash_attn_tpu.ops.matmul import W4A8Weight

            q4 = quantize_int4(w, group_size=group_size, layout="halves")
            return W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)
        raise ValueError(mode)

    proj_names = ("wq", "wk", "wv", "wqkv", "wo", "w_gate", "w_up",
                  "w_gate_up", "w_down")
    out = {k: v for k, v in params.items()}
    out["blocks"] = []
    for blk in params["blocks"]:
        nb = dict(blk)
        for name in proj_names:
            if name in nb:
                nb[name] = quant(blk[name])
        out["blocks"].append(nb)
    if "lm_head" not in skip and not isinstance(params["lm_head"], tuple):
        out["lm_head"] = quant(params["lm_head"], head_mode or mode)
    return out


def fuse_projections(params):
    """Fuse wq/wk/wv -> wqkv and w_gate/w_up -> w_gate_up per block (single
    matmul each; ops/matmul.concat_weights).  Works before OR after
    quantize_weights — every supported scale scheme is column-independent,
    so the fused matmul is numerically identical to the three separate
    calls.  Motivation: the r4 device trace put the composed decode step's
    gap entirely in per-pallas_call fixed cost (15 matmul calls/step);
    fusing cuts that to 9.  NOT for Megatron-TP trees: the fused output
    axis concatenates whole projections, which does not align with
    per-device column shards (parallel/tp.py keeps the unfused names)."""
    from flash_attn_tpu.ops.matmul import concat_weights

    out = {k: v for k, v in params.items()}
    out["blocks"] = []
    for blk in params["blocks"]:
        if "wqkv" in blk:  # already fused: idempotent no-op
            out["blocks"].append(blk)
            continue
        nb = {
            k: v for k, v in blk.items()
            if k not in ("wq", "wk", "wv", "w_gate", "w_up")
        }
        nb["wqkv"] = concat_weights([blk["wq"], blk["wk"], blk["wv"]])
        nb["w_gate_up"] = concat_weights([blk["w_gate"], blk["w_up"]])
        out["blocks"].append(nb)
    return out


def load_hf(model_name: str, dtype="bfloat16"):
    """Convert a HuggingFace Llama checkpoint (torch CPU) to our pytree."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_name, torch_dtype=torch.float32, low_cpu_mem_usage=True
    )
    return convert_hf_model(model, dtype=dtype)


def convert_hf_model(model, dtype="bfloat16"):
    """Map a torch LlamaForCausalLM (its config + state dict) to our pytree.

    Validated logit-exactly against a torch Llama built from config in
    tests/test_hf_parity.py (SURVEY.md §4.4; public checkpoints are
    unavailable in this zero-egress image).
    """
    import torch

    hf = model.config
    sd = model.state_dict()
    del model
    dt = jnp.dtype(dtype)

    def arr(name, transpose=True):
        t = sd[name].detach().to(torch.float32).numpy()
        return jnp.asarray(t.T if transpose else t, dt)

    cfg = LlamaConfig(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        intermediate=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=hf.hidden_size // hf.num_attention_heads,
        rope_theta=float(getattr(hf, "rope_theta", 500000.0)),
        rms_eps=float(hf.rms_norm_eps),
        max_position=hf.max_position_embeddings,
        dtype=dtype,
        tie_embeddings=bool(getattr(hf, "tie_word_embeddings", False)),
        qkv_bias="model.layers.0.self_attn.q_proj.bias" in sd,
    )

    def proj(name):
        w = arr(name + ".weight")
        if cfg.qkv_bias and name + ".bias" in sd:
            from flash_attn_tpu.ops.matmul import BiasedWeight

            return BiasedWeight(w, arr(name + ".bias", transpose=False))
        return w

    blocks = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        blocks.append({
            "attn_norm": arr(p + "input_layernorm.weight", transpose=False),
            "wq": proj(p + "self_attn.q_proj"),
            "wk": proj(p + "self_attn.k_proj"),
            "wv": proj(p + "self_attn.v_proj"),
            "wo": arr(p + "self_attn.o_proj.weight"),
            "mlp_norm": arr(p + "post_attention_layernorm.weight", transpose=False),
            "w_gate": arr(p + "mlp.gate_proj.weight"),
            "w_up": arr(p + "mlp.up_proj.weight"),
            "w_down": arr(p + "mlp.down_proj.weight"),
        })
    params = {
        "tok_emb": arr("model.embed_tokens.weight", transpose=False),
        "blocks": blocks,
        "final_norm": arr("model.norm.weight", transpose=False),
        "lm_head": (
            arr("model.embed_tokens.weight", transpose=False).T
            if cfg.tie_embeddings
            else arr("lm_head.weight")
        ),
    }
    return params, cfg
