"""GPT-2 in pure JAX (no flax): pytree params, flash-attention core.

BASELINE.json config 0: GPT-2 124M decode, BF16 weights + INT8 KV-cache,
batch 1, seq 1024 — the CPU-runnable oracle that proves the whole stack
(model -> flash kernels -> quantized KV -> decode loop) end to end.

Weight loading converts HuggingFace ``gpt2`` checkpoints (transformers, torch
CPU) into the param pytree; greedy decode is tested against the HF reference
(SURVEY.md §4.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.decode import flash_decode


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    max_position: int = 1024
    num_layers: int = 12
    num_heads: int = 12
    hidden: int = 768
    dtype: str = "float32"
    # Softmax statistics mode for the inference paths (prefill/decode_multi
    # prefill kernels).  "clamped" (no running max) assumes attention logits
    # stay under ~55 nats; GPT-2 has no qk-norm or softcap, and GPT-2-class
    # checkpoints are documented to grow large attention-sink logits, so the
    # contract is NOT architecturally guaranteed — validate a real
    # checkpoint once with ``max_attention_logit`` (below) and set
    # softmax_mode="online" if it probes above ~50 nats.  Training always
    # runs online regardless.
    softmax_mode: str = "clamped"

    @property
    def head_dim(self):
        return self.hidden // self.num_heads


GPT2_124M = GPT2Config()
GPT2_TINY = GPT2Config(
    vocab_size=1024, max_position=128, num_layers=2, num_heads=4, hidden=128
)


def init_params(cfg: GPT2Config, key) -> dict:
    """Random init (tests use this; real weights come from load_hf)."""
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 4 + 12 * cfg.num_layers))

    def dense(kin, kout):
        return {
            "w": jax.random.normal(next(keys), (kin, kout), dtype) * 0.02,
            "b": jnp.zeros((kout,), dtype),
        }

    def ln():
        return {"g": jnp.ones((cfg.hidden,), dtype), "b": jnp.zeros((cfg.hidden,), dtype)}

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append(
            {
                "ln_1": ln(),
                "attn": {
                    "qkv": dense(cfg.hidden, 3 * cfg.hidden),
                    "proj": dense(cfg.hidden, cfg.hidden),
                },
                "ln_2": ln(),
                "mlp": {
                    "fc": dense(cfg.hidden, 4 * cfg.hidden),
                    "proj": dense(4 * cfg.hidden, cfg.hidden),
                },
            }
        )
    return {
        "wte": jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden), dtype) * 0.02,
        "wpe": jax.random.normal(next(keys), (cfg.max_position, cfg.hidden), dtype) * 0.01,
        "blocks": blocks,
        "ln_f": ln(),
    }


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return (
        jnp.einsum("...i,ij->...j", x.astype(jnp.float32), p["w"].astype(jnp.float32))
        + p["b"].astype(jnp.float32)
    ).astype(x.dtype)


def _split_heads(x, num_heads):
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads)


def forward(params, tokens, cfg: GPT2Config, *, interpret=None):
    """Full-sequence forward (prefill/training): tokens [B, S] -> logits
    [B, S, V].  Attention is the Pallas flash kernel, causal."""
    b, s = tokens.shape
    x = params["wte"][tokens] + params["wpe"][jnp.arange(s)]
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads)
        k = _split_heads(k, cfg.num_heads)
        v = _split_heads(v, cfg.num_heads)
        attn = flash_attention(q, k, v, causal=True, interpret=interpret)
        attn = attn.reshape(b, s, cfg.hidden)
        x = x + _dense(attn, blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = _dense(h, blk["mlp"]["fc"])
        m = jax.nn.gelu(m, approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    x = _layer_norm(x, params["ln_f"])
    return jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )


def max_attention_logit(params, tokens, cfg: GPT2Config) -> float:
    """Checkpoint-validation probe for the clamped-softmax contract: the
    maximum |scaled attention logit| over all layers/heads for a calibration
    batch (O(S^2) memory — use a ~1k-token probe).  GPT-2 checkpoints can
    carry attention-sink logits; run this once per real checkpoint and keep
    cfg.softmax_mode="clamped" only if the result is comfortably below ~50
    (clamped is exact for natural-units logits <= 55)."""
    b, s = tokens.shape
    x = params["wte"][tokens] + params["wpe"][jnp.arange(s)]
    worst = jnp.float32(0.0)
    scale = cfg.head_dim ** -0.5
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads).astype(jnp.float32)
        k = _split_heads(k, cfg.num_heads).astype(jnp.float32)
        v = _split_heads(v, cfg.num_heads)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        causal = jnp.tril(jnp.ones((s, s), bool))
        worst = jnp.maximum(
            worst, jnp.max(jnp.abs(jnp.where(causal, scores, 0.0)))
        )
        attn = flash_attention(
            q.astype(x.dtype), k.astype(x.dtype), v, causal=True,
            interpret=True,
        ).reshape(b, s, cfg.hidden)
        x = x + _dense(attn, blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        x = x + _dense(
            jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True),
            blk["mlp"]["proj"],
        )
    return float(worst)


def prefill(params, tokens, cfg: GPT2Config, cache: KVCache, *, interpret=None):
    """Run the prompt through the model, filling the KV cache.  Returns
    (logits_last [B, V], cache)."""
    b, s = tokens.shape
    x = params["wte"][tokens] + params["wpe"][cache.length[:, None] + jnp.arange(s)]
    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads)
        k = _split_heads(k, cfg.num_heads)
        v = _split_heads(v, cfg.num_heads)
        cache = cache.append(i, k, v)
        attn = flash_attention(q, k, v, causal=True,
                               softmax_mode=cfg.softmax_mode, interpret=interpret)
        attn = attn.reshape(b, s, cfg.hidden)
        x = x + _dense(attn, blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    cache = cache.advance(s)
    x = _layer_norm(x[:, -1], params["ln_f"])
    logits = jnp.einsum(
        "bh,vh->bv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, cache


def decode_step(params, token, cfg: GPT2Config, cache: KVCache, *, interpret=None):
    """One decode step: token [B] -> (logits [B, V], cache).  Attention reads
    the (possibly quantized) cache through the flash-decode kernel with fused
    dequant."""
    b = token.shape[0]
    x = params["wte"][token] + params["wpe"][cache.length]  # [B, H]
    x = x[:, None, :]  # [B, 1, H]
    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache = cache.append(i, _split_heads(k, cfg.num_heads), _split_heads(v, cfg.num_heads))
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode(
            _split_heads(q, cfg.num_heads)[:, 0],  # [B, H, D]
            kc, vc, k_scale=ks, v_scale=vs,
            kv_length=cache.length + 1,
            kv_layout="bhsd",
            interpret=interpret, **cache.scale_args(),
        )  # [B, H, D]
        x = x + _dense(attn.reshape(b, 1, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    cache = cache.advance(1)
    x = _layer_norm(x[:, 0], params["ln_f"])
    logits = jnp.einsum(
        "bh,vh->bv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, cache


def decode_multi(params, tokens, cfg: GPT2Config, cache: KVCache, *,
                 interpret=None):
    """T cached decode tokens per sequence in ONE pass (the speculative
    verify step; see models/llama.py decode_multi): tokens [B, T] ->
    (logits [B, T, V], cache) via flash_decode_chunk — one cache sweep
    scores all T positions, causal within the chunk."""
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    b, t = tokens.shape
    pos = cache.length[:, None] + jnp.arange(t)[None]  # [B, T]
    x = params["wte"][tokens] + params["wpe"][pos]  # [B, T, H]
    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache = cache.append(
            i, _split_heads(k, cfg.num_heads), _split_heads(v, cfg.num_heads)
        )
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode_chunk(
            _split_heads(q, cfg.num_heads),  # [B, T, H, D]
            kc, vc, k_scale=ks, v_scale=vs,
            kv_length=cache.length + t,
            kv_layout="bhsd",
            interpret=interpret, **cache.scale_args(),
        )  # [B, T, H, D]
        x = x + _dense(attn.reshape(b, t, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    cache = cache.advance(t)
    x = _layer_norm(x, params["ln_f"])
    logits = jnp.einsum(
        "bth,vh->btv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, cache


def prefill_chunk(params, tokens, cfg: GPT2Config, cache: KVCache, slot,
                  start, *, interpret=None):
    """Chunked prefill: run chunk ``tokens`` [1, C] of the sequence in
    ``slot`` whose first ``start`` positions are already cached.  Writes the
    chunk's KV at [start, start+C) and attends over prefix + chunk via the
    in-kernel positions mask (no O(S^2) bias).  Returns (logits [1, C, V],
    cache).  The engine interleaves decode steps between chunks so a long
    prompt never stalls the decode batch (head-of-line blocking fix)."""
    b, c = tokens.shape
    cap = cache.capacity
    x = params["wte"][tokens] + params["wpe"][start + jnp.arange(c)][None]
    qpos = (start + jnp.arange(c))[None]
    kvpos = jnp.arange(cap)[None]
    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache = cache.insert_at(
            i, slot, _split_heads(k, cfg.num_heads)[0],
            _split_heads(v, cfg.num_heads)[0], start,
        )
        kc, vc = cache.slot_kv_float(i, slot, dtype=x.dtype)
        attn = flash_attention(
            _split_heads(q, cfg.num_heads), kc, vc,
            q_positions=qpos, kv_positions=kvpos,
            softmax_mode=cfg.softmax_mode, interpret=interpret,
        )
        x = x + _dense(attn.reshape(b, c, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    x = _layer_norm(x, params["ln_f"])
    logits = jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, cache


def decode_step_paged(params, token, cfg: GPT2Config, pool, *, interpret=None):
    """One decode step against a PagedKVPool: token [B] -> (logits, pool).
    Attention runs the scalar-prefetch paged kernel (ops/paged_decode.py) —
    pages DMA by block-table index, no gather."""
    from flash_attn_tpu.engine.paged import paged_decode_attention

    b = token.shape[0]
    x = params["wte"][token] + params["wpe"][pool.length]
    x = x[:, None, :]
    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        pool = pool.append_token(
            i, _split_heads(k, cfg.num_heads)[:, 0],
            _split_heads(v, cfg.num_heads)[:, 0],
        )
        attn = paged_decode_attention(
            pool.advance(1), i, _split_heads(q, cfg.num_heads)[:, 0],
            interpret=interpret,
        )
        x = x + _dense(attn.reshape(b, 1, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    pool = pool.advance(1)
    x = _layer_norm(x[:, 0], params["ln_f"])
    logits = jnp.einsum(
        "bh,vh->bv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, pool


def prefill_with_kv(params, tokens, positions, cfg: GPT2Config, *, interpret=None):
    """Engine adapter: full logits + per-layer KV without touching a cache.
    tokens/positions: [1, S]. Returns (logits [1, S, V], [(k, v), ...])."""
    b, s = tokens.shape
    x = params["wte"][tokens] + params["wpe"][positions]
    kvs = []
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads)
        k = _split_heads(k, cfg.num_heads)
        v = _split_heads(v, cfg.num_heads)
        kvs.append((k, v))
        # inference-only: clamped softmax (exact in-contract; see
        # FlashConfig.softmax_mode)
        attn = flash_attention(q, k, v, causal=True,
                               softmax_mode=cfg.softmax_mode, interpret=interpret)
        x = x + _dense(attn.reshape(b, s, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    x = _layer_norm(x, params["ln_f"])
    logits = jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, kvs


def prefill_packed(params, tokens, positions, segment_ids, cfg: GPT2Config,
                   *, interpret=None):
    """Packed multi-prompt prefill (see llama.prefill_packed)."""
    b, t = tokens.shape
    x = params["wte"][tokens] + params["wpe"][positions]
    kvs = []
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln_1"])
        qkv = _dense(h, blk["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads)
        k = _split_heads(k, cfg.num_heads)
        v = _split_heads(v, cfg.num_heads)
        kvs.append((k, v))
        attn = flash_attention(
            q, k, v,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            q_positions=positions, kv_positions=positions,
            softmax_mode=cfg.softmax_mode, interpret=interpret,
        )
        x = x + _dense(attn.reshape(b, t, cfg.hidden), blk["attn"]["proj"])
        h = _layer_norm(x, blk["ln_2"])
        m = jax.nn.gelu(_dense(h, blk["mlp"]["fc"]), approximate=True)
        x = x + _dense(m, blk["mlp"]["proj"])
    x = _layer_norm(x, params["ln_f"])
    logits = jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), params["wte"].astype(jnp.float32)
    )
    return logits, kvs


def make_adapter(cfg: GPT2Config, *, interpret=None, eos_token=None):
    """Engine adapter for GPT-2 (engine/engine.py ModelAdapter)."""
    from flash_attn_tpu.engine.engine import ModelAdapter

    return ModelAdapter(
        prefill_with_kv=lambda p, t, pos: prefill_with_kv(
            p, t, pos, cfg, interpret=interpret
        ),
        decode_step=lambda p, tok, cache: decode_step(
            p, tok, cfg, cache, interpret=interpret
        ),
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
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_heads,
        head_dim=cfg.head_dim,
        eos_token=eos_token,
    )


def make_cache(cfg: GPT2Config, batch, capacity, mode="none", dtype=None):
    return KVCache.create(
        cfg.num_layers, batch, capacity, cfg.num_heads, cfg.head_dim,
        dtype=jnp.dtype(dtype or cfg.dtype), mode=mode,
    )


def greedy_decode(params, prompt, cfg: GPT2Config, *, steps, kv_mode="none",
                  capacity=None, interpret=None):
    """Greedy generation: prompt [B, S0] -> tokens [B, steps]."""
    b, s0 = prompt.shape
    capacity = capacity or (s0 + steps)
    cache = make_cache(cfg, b, capacity, mode=kv_mode)
    logits, cache = prefill(params, prompt, cfg, cache, interpret=interpret)
    tok = jnp.argmax(logits, axis=-1)
    outs = [tok]
    for _ in range(steps - 1):
        logits, cache = decode_step(params, tok, cfg, cache, interpret=interpret)
        tok = jnp.argmax(logits, axis=-1)
        outs.append(tok)
    return jnp.stack(outs, axis=1)


def load_hf(model_name: str = "gpt2", dtype="float32"):
    """Convert a HuggingFace GPT-2 checkpoint to our param pytree."""
    from transformers import GPT2LMHeadModel

    model = GPT2LMHeadModel.from_pretrained(model_name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del model
    return convert_hf_state_dict(sd, dtype=dtype)


def convert_hf_state_dict(sd: dict, dtype="float32", num_heads=None):
    """Map a HF GPT2LMHeadModel state dict (numpy values) to our pytree.

    HF stores conv1d-style weights with shape [in, out] — same orientation as
    our dense, so no transpose needed.  Validated token-exactly against a
    torch GPT-2 built from config in tests/test_hf_parity.py (SURVEY.md §4.4;
    the public checkpoint itself is unavailable in this zero-egress image).

    num_heads: pass explicitly for non-standard configs — the state dict
    doesn't record it; known GPT-2 family sizes are inferred from hidden.
    """
    njl = jnp.dtype(dtype)

    def arr(name):
        return jnp.asarray(sd[name], njl)

    n_layer = len({k.split(".")[2] for k in sd if k.startswith("transformer.h.")})
    cfg = GPT2Config(
        vocab_size=sd["transformer.wte.weight"].shape[0],
        max_position=sd["transformer.wpe.weight"].shape[0],
        num_layers=n_layer,
        num_heads=num_heads
        or {768: 12, 1024: 16, 1280: 20, 1600: 25}.get(
            sd["transformer.wte.weight"].shape[1],
            max(sd["transformer.wte.weight"].shape[1] // 64, 1),
        ),
        hidden=sd["transformer.wte.weight"].shape[1],
        dtype=dtype,
    )
    blocks = []
    for i in range(n_layer):
        p = f"transformer.h.{i}."
        blocks.append({
            "ln_1": {"g": arr(p + "ln_1.weight"), "b": arr(p + "ln_1.bias")},
            "attn": {
                "qkv": {"w": arr(p + "attn.c_attn.weight"), "b": arr(p + "attn.c_attn.bias")},
                "proj": {"w": arr(p + "attn.c_proj.weight"), "b": arr(p + "attn.c_proj.bias")},
            },
            "ln_2": {"g": arr(p + "ln_2.weight"), "b": arr(p + "ln_2.bias")},
            "mlp": {
                "fc": {"w": arr(p + "mlp.c_fc.weight"), "b": arr(p + "mlp.c_fc.bias")},
                "proj": {"w": arr(p + "mlp.c_proj.weight"), "b": arr(p + "mlp.c_proj.bias")},
            },
        })
    params = {
        "wte": arr("transformer.wte.weight"),
        "wpe": arr("transformer.wpe.weight"),
        "blocks": blocks,
        "ln_f": {"g": arr("transformer.ln_f.weight"), "b": arr("transformer.ln_f.bias")},
    }
    return params, cfg
