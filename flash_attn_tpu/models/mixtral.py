"""Mixtral-style sparse-MoE transformer in pure JAX: the Llama attention
stack (RMSNorm + RoPE + GQA, flash-attention core) with a top-k routed
mixture-of-experts FFN per block (B11 model-family widening; exercises the
B8 expert-parallel path end-to-end).

Param pytree layout (per block): attn_norm, wq/wk/wv/wo, mlp_norm,
router [H, E], experts = [{w_gate, w_up, w_down}, ...] (a Python list so
every expert projection dispatches through ops/matmul.quantized_matmul and
weight-only INT8/INT4 quantization reuses the Llama machinery unchanged).

Routing matches HF Mixtral exactly: softmax over the top-k router logits
(HF's softmax-all-then-renormalize-top-k is algebraically the same thing),
computed in fp32.  The dense forward evaluates every expert and combines
with the (mostly-zero) routing weights — the exact, capacity-less form; the
scale-up path shards experts over a mesh axis via parallel/moe.moe_ffn_ep
(see stack_experts + tests/test_mixtral.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.decode import flash_decode
from flash_attn_tpu.parallel.moe import router_topk
from flash_attn_tpu.models.llama import (
    _proj,
    _rms_norm,
    apply_rope,
    rope_cos_sin,
)


@dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden: int = 4096
    intermediate: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    num_experts: int = 8
    top_k: int = 2
    rope_theta: float = 1e6
    rms_eps: float = 1e-5
    max_position: int = 32768
    dtype: str = "bfloat16"
    # Mistral-style sliding-window attention: each token attends to the
    # previous (sliding_window - 1) tokens plus itself.  None = global.
    sliding_window: int | None = None


MIXTRAL_8X7B = MixtralConfig()
MIXTRAL_TINY = MixtralConfig(
    vocab_size=512, hidden=64, intermediate=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, num_experts=4, top_k=2,
    max_position=256, rope_theta=10000.0, dtype="float32",
)


def init_params(cfg: MixtralConfig, key) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    nkeys = 3 + cfg.num_layers * (5 + 3 * cfg.num_experts)
    keys = iter(jax.random.split(key, nkeys))

    def w(kin, kout, scale=0.02):
        return jax.random.normal(next(keys), (kin, kout), dtype) * scale

    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "attn_norm": jnp.ones((cfg.hidden,), dtype),
            "wq": w(cfg.hidden, q_dim),
            "wk": w(cfg.hidden, kv_dim),
            "wv": w(cfg.hidden, kv_dim),
            "wo": w(q_dim, cfg.hidden),
            "mlp_norm": jnp.ones((cfg.hidden,), dtype),
            "router": w(cfg.hidden, cfg.num_experts, scale=0.1),
            "experts": [
                {
                    "w_gate": w(cfg.hidden, cfg.intermediate),
                    "w_up": w(cfg.hidden, cfg.intermediate),
                    "w_down": w(cfg.intermediate, cfg.hidden),
                }
                for _ in range(cfg.num_experts)
            ],
        })
    return {
        "tok_emb": w(cfg.vocab_size, cfg.hidden),
        "blocks": blocks,
        "final_norm": jnp.ones((cfg.hidden,), dtype),
        "lm_head": w(cfg.hidden, cfg.vocab_size),
    }


def _moe_mlp(x, blk, cfg: MixtralConfig, interpret=None):
    """Routed FFN: x [..., H] -> x + combine(top-k expert outputs).

    Evaluates all experts (exact, capacity-less) with each expert projection
    going through quantized_matmul, so INT8/INT4 expert weights take the
    weight-only Pallas kernels.  Router math in fp32."""
    h = _rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
    lead = h.shape[:-1]
    hs = h.reshape(-1, cfg.hidden)
    logits = hs.astype(jnp.float32) @ blk["router"].astype(jnp.float32)
    combine = router_topk(logits, cfg.top_k)  # [T, E], top-k softmaxed
    out = jnp.zeros((hs.shape[0], cfg.hidden), jnp.float32)
    for e, ex in enumerate(blk["experts"]):
        gate = _proj(hs, ex["w_gate"], interpret)
        up = _proj(hs, ex["w_up"], interpret)
        act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
        oe = _proj(act.astype(hs.dtype), ex["w_down"], interpret)
        out = out + combine[:, e:e + 1] * oe.astype(jnp.float32)
    return x + out.astype(x.dtype).reshape(*lead, cfg.hidden)


def forward(params, tokens, cfg: MixtralConfig, *, positions=None,
            segment_ids=None, interpret=None):
    """tokens [B, S] -> logits [B, S, V] (causal full-sequence)."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    for blk in params["blocks"]:
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)  # q rotates in-kernel (rope_cos/sin)
        wnd = (
            None if cfg.sliding_window is None else (cfg.sliding_window - 1, -1)
        )
        attn = flash_attention(
            q, k, v, causal=True, window=wnd,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            rope_cos=cos, rope_sin=sin,
            interpret=interpret,
        )
        x = x + _proj(
            attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret)


def prefill_with_kv(params, tokens, positions, cfg: MixtralConfig, *,
                    interpret=None):
    """Engine-adapter prefill: logits [1, S, V] + per-layer rope'd KV."""
    b, s = tokens.shape
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    kvs = []
    for blk in params["blocks"]:
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)  # q rotates in-kernel
        kvs.append((k, v))
        wnd = (
            None if cfg.sliding_window is None else (cfg.sliding_window - 1, -1)
        )
        attn = flash_attention(q, k, v, causal=True, window=wnd,
                               rope_cos=cos, rope_sin=sin,
                               softmax_mode="clamped",
                               interpret=interpret)
        x = x + _proj(
            attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret), kvs


def prefill_packed(params, tokens, positions, segment_ids, cfg: MixtralConfig,
                   *, interpret=None):
    """Packed multi-prompt prefill (see llama.prefill_packed)."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    kvs = []
    for blk in params["blocks"]:
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)  # q rotates in-kernel
        kvs.append((k, v))
        wnd = (
            None if cfg.sliding_window is None else (cfg.sliding_window - 1, -1)
        )
        attn = flash_attention(
            q, k, v, window=wnd,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            q_positions=positions, kv_positions=positions,
            rope_cos=cos, rope_sin=sin,
            softmax_mode="clamped", interpret=interpret,
        )
        x = x + _proj(
            attn.reshape(b, t, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret), kvs


def decode_step(params, token, cfg: MixtralConfig, cache: KVCache, *,
                interpret=None):
    """One cached decode step: token [B] -> (logits [B, V], cache)."""
    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]
    cos, sin = rope_cos_sin(cache.length[:, None], cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode(
            q[:, 0], kc, vc, k_scale=ks, v_scale=vs,
            kv_length=cache.length + 1, kv_layout="bhsd", interpret=interpret,
            window=cfg.sliding_window, **cache.scale_args(),
        )
        x = x + _proj(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    cache = cache.advance(1)
    x = _rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret), cache


def decode_multi(params, tokens, cfg: MixtralConfig, cache: KVCache, *,
                 interpret=None):
    """T cached decode tokens per sequence in ONE pass (speculative-verify
    step; see llama.decode_multi) — MoE MLP runs on the [B, T] chunk."""
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    pos = cache.length[:, None] + jnp.arange(t)[None]
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode_chunk(
            q, kc, vc, k_scale=ks, v_scale=vs, kv_length=cache.length + t,
            kv_layout="bhsd", interpret=interpret,
            window=cfg.sliding_window, **cache.scale_args(),
        )
        x = x + _proj(
            attn.reshape(b, t, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    cache = cache.advance(t)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret), cache


def decode_step_paged(params, token, cfg: MixtralConfig, pool, *,
                      interpret=None):
    """One decode step against a PagedKVPool (scalar-prefetch paged kernel)
    — paged MoE serving (see llama.decode_step_paged)."""
    from flash_attn_tpu.engine.paged import paged_decode_attention

    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]
    cos, sin = rope_cos_sin(pool.length[:, None], cfg.head_dim, cfg.rope_theta)
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        pool = pool.append_token(i, k[:, 0], v[:, 0])
        attn = paged_decode_attention(
            pool.advance(1), i, q[:, 0], interpret=interpret,
            window=cfg.sliding_window,
        )
        x = x + _proj(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk["wo"], interpret
        )
        x = _moe_mlp(x, blk, cfg, interpret=interpret)
    pool = pool.advance(1)
    x = _rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps)
    return _proj(x.astype(jnp.float32), params["lm_head"], interpret), pool


def make_cache(cfg: MixtralConfig, batch, capacity, mode="none", dtype=None):
    return KVCache.create(
        cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.dtype(dtype or cfg.dtype), mode=mode,
    )


def make_adapter(cfg: MixtralConfig, *, interpret=None, eos_token=None):
    from flash_attn_tpu.engine.engine import ModelAdapter

    return ModelAdapter(
        prefill_with_kv=lambda p, t, pos: prefill_with_kv(
            p, t, pos, cfg, interpret=interpret
        ),
        decode_step=lambda p, tok, cache: decode_step(
            p, tok, cfg, cache, interpret=interpret
        ),
        prefill_packed=lambda p, t, pos, seg: prefill_packed(
            p, t, pos, seg, cfg, interpret=interpret
        ),
        decode_multi=lambda p, toks, cache: decode_multi(
            p, toks, cfg, cache, interpret=interpret
        ),
        decode_step_paged=lambda p, tok, pool: decode_step_paged(
            p, tok, cfg, pool, interpret=interpret
        ),
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        eos_token=eos_token,
    )


def stack_experts(blk):
    """Stack a block's per-expert float weights into the [E, ...] arrays
    parallel/moe.make_moe_ffn expects (router, w_gate, w_up, w_down).
    Quantized experts must be stacked before quantization."""
    wg = jnp.stack([ex["w_gate"] for ex in blk["experts"]])
    wu = jnp.stack([ex["w_up"] for ex in blk["experts"]])
    wd = jnp.stack([ex["w_down"] for ex in blk["experts"]])
    return blk["router"], wg, wu, wd


def quantize_weights(params, mode: str = "int8", group_size: int = 128):
    """Weight-only quantization of attention + expert projections (router,
    embeddings, head stay float — routers are tiny and precision-critical)."""
    from flash_attn_tpu.ops.quant import quantize_int4, quantize_int8

    def quant(w):
        if mode == "int8":
            vals, scale = quantize_int8(w, axes=(0,))
            return (vals, scale[0])
        if mode == "w8a8":
            # W8A8Weight pytree class, same as llama's quantize_weights —
            # the legacy ("w8a8", ...) string-tagged tuple cannot ride as
            # a jit argument (quantized_matmul still dispatches old trees).
            from flash_attn_tpu.ops.matmul import W8A8Weight

            vals, scale = quantize_int8(w, axes=(0,))
            return W8A8Weight(vals, scale[0])
        if mode == "int4":
            return quantize_int4(w, group_size=group_size)
        if mode == "w4a8":
            from flash_attn_tpu.ops.matmul import W4A8Weight

            q4 = quantize_int4(w, group_size=group_size, layout="halves")
            return W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)
        raise ValueError(mode)

    out = {k: v for k, v in params.items()}
    out["blocks"] = []
    for blk in params["blocks"]:
        nb = dict(blk)
        for name in ("wq", "wk", "wv", "wo"):
            nb[name] = quant(blk[name])
        nb["experts"] = [
            {name: quant(ex[name]) for name in ("w_gate", "w_up", "w_down")}
            for ex in blk["experts"]
        ]
        out["blocks"].append(nb)
    return out


def load_hf(model_name: str, dtype="bfloat16"):
    """Convert a HuggingFace Mixtral checkpoint (torch CPU) to our pytree."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_name, torch_dtype=torch.float32, low_cpu_mem_usage=True
    )
    return convert_hf_model(model, dtype=dtype)


def convert_hf_model(model, dtype="bfloat16"):
    """Map a torch MixtralForCausalLM to our pytree.  Validated logit-close
    against a torch Mixtral built from config in tests/test_mixtral.py
    (HF routing = softmax-all-then-renormalize-top-k, which equals our
    softmax-over-top-k-logits exactly)."""
    import torch

    hf = model.config
    sd = model.state_dict()
    del model
    dt = jnp.dtype(dtype)

    def arr(name, transpose=True):
        t = sd[name].detach().to(torch.float32).numpy()
        return jnp.asarray(t.T if transpose else t, dt)

    cfg = MixtralConfig(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        intermediate=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=hf.hidden_size // hf.num_attention_heads,
        num_experts=hf.num_local_experts,
        top_k=hf.num_experts_per_tok,
        rope_theta=float(getattr(hf, "rope_theta", 1e6)),
        rms_eps=float(hf.rms_norm_eps),
        max_position=hf.max_position_embeddings,
        dtype=dtype,
    )
    blocks = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        m = p + "block_sparse_moe."
        blocks.append({
            "attn_norm": arr(p + "input_layernorm.weight", transpose=False),
            "wq": arr(p + "self_attn.q_proj.weight"),
            "wk": arr(p + "self_attn.k_proj.weight"),
            "wv": arr(p + "self_attn.v_proj.weight"),
            "wo": arr(p + "self_attn.o_proj.weight"),
            "mlp_norm": arr(p + "post_attention_layernorm.weight", transpose=False),
            "router": arr(m + "gate.weight"),
            "experts": [
                {
                    "w_gate": arr(m + f"experts.{e}.w1.weight"),
                    "w_up": arr(m + f"experts.{e}.w3.weight"),
                    "w_down": arr(m + f"experts.{e}.w2.weight"),
                }
                for e in range(cfg.num_experts)
            ],
        })
    params = {
        "tok_emb": arr("model.embed_tokens.weight", transpose=False),
        "blocks": blocks,
        "final_norm": arr("model.norm.weight", transpose=False),
        "lm_head": arr("lm_head.weight"),
    }
    return params, cfg
