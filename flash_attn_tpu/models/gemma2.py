"""Gemma-2 in pure JAX: the model family that exercises every round-2
kernel feature at once — logit softcapping (attention + final logits),
alternating sliding/full attention layers, head_dim 256, GQA, rope, and
sandwich (pre+post) RMSNorms with GeGLU MLPs.

Conventions match HF ``Gemma2ForCausalLM`` exactly (validated token-exactly
by tests/test_hf_parity.py against a random-init torch model):

- RMSNorm multiplies by ``(1 + weight)`` with the product taken in fp32
  *before* the downcast (HF PR #29402 ordering).
- Sandwich norms: ``x + post_norm(attn(pre_norm(x)))`` and the same for the
  MLP (``pre_feedforward_layernorm`` / ``post_feedforward_layernorm``).
- Embeddings scaled by sqrt(hidden); lm head tied to the embedding.
- Attention scale is ``query_pre_attn_scalar ** -0.5`` (NOT head_dim).
- Attention logits capped at ``attn_logit_softcap`` (in-kernel,
  ops/flash_fwd logit_softcap); final logits capped at
  ``final_logit_softcap``.
- Even layers (0, 2, ...) use sliding-window attention of
  ``sliding_window`` tokens (inclusive of self); odd layers are global.

The reference ABI has none of this (its only masking is is_causal +
additive attn_mask, flash_attn.h:29,35); Gemma-2 is a beyond-reference
consumer of the kernel family.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.decode import flash_decode
from flash_attn_tpu.ops.matmul import quantized_matmul
from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate as apply_rope


@dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256128
    hidden: int = 3584
    intermediate: int = 14336
    num_layers: int = 42
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 256
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_position: int = 8192
    dtype: str = "bfloat16"
    sliding_window: int = 4096
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcap: float = 50.0
    final_logit_softcap: float = 30.0


GEMMA2_9B = Gemma2Config()
GEMMA2_27B = Gemma2Config(
    hidden=4608, intermediate=36864, num_layers=46, num_heads=32,
    num_kv_heads=16, head_dim=128, query_pre_attn_scalar=144.0,
)
GEMMA2_TINY = Gemma2Config(
    vocab_size=512, hidden=64, intermediate=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_position=128,
    sliding_window=16, query_pre_attn_scalar=16.0, dtype="float32",
)


def _is_sliding(layer_idx: int) -> bool:
    """HF Gemma2 layer_types: even layers sliding, odd layers global."""
    return layer_idx % 2 == 0


def _wnd(cfg: Gemma2Config, layer_idx: int):
    """(left, right) window for flash_attention, or None (global layer)."""
    if not _is_sliding(layer_idx):
        return None
    return (cfg.sliding_window - 1, -1)


def _dec_wnd(cfg: Gemma2Config, layer_idx: int):
    """window for flash_decode (token count), or None."""
    return cfg.sliding_window if _is_sliding(layer_idx) else None


def init_params(cfg: Gemma2Config, key) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 2 + 7 * cfg.num_layers))

    def w(kin, kout, scale=0.02):
        return jax.random.normal(next(keys), (kin, kout), dtype) * scale

    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            # norm weights are ZERO-centered (effective gain = 1 + w)
            "attn_norm": jnp.zeros((cfg.hidden,), dtype),
            "post_attn_norm": jnp.zeros((cfg.hidden,), dtype),
            "wq": w(cfg.hidden, q_dim),
            "wk": w(cfg.hidden, kv_dim),
            "wv": w(cfg.hidden, kv_dim),
            "wo": w(q_dim, cfg.hidden),
            "pre_mlp_norm": jnp.zeros((cfg.hidden,), dtype),
            "post_mlp_norm": jnp.zeros((cfg.hidden,), dtype),
            "w_gate": w(cfg.hidden, cfg.intermediate),
            "w_up": w(cfg.hidden, cfg.intermediate),
            "w_down": w(cfg.intermediate, cfg.hidden),
        })
    return {
        "tok_emb": w(cfg.vocab_size, cfg.hidden),
        "blocks": blocks,
        "final_norm": jnp.zeros((cfg.hidden,), dtype),
    }


def _rms_norm(x, g, eps):
    """Gemma RMSNorm: fp32 normalize, multiply by (1 + g) in fp32, then
    downcast (matches HF Gemma2RMSNorm op order exactly)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * (1.0 + g.astype(jnp.float32))
    return out.astype(x.dtype)


def _proj(x, w, interpret=None):
    lead = x.shape[:-1]
    out = quantized_matmul(x.reshape(-1, x.shape[-1]), w, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _embed(params, tokens, cfg):
    # HF multiplies embeddings by sqrt(hidden) cast to the embed dtype
    normalizer = jnp.asarray(
        cfg.hidden ** 0.5, jnp.dtype(cfg.dtype)
    ).astype(jnp.float32)
    x = params["tok_emb"][tokens]
    return (x.astype(jnp.float32) * normalizer).astype(x.dtype)


def _final_logits(params, x, cfg, interpret):
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _proj(x.astype(jnp.float32), params["tok_emb"].T, interpret)
    cap = cfg.final_logit_softcap
    if cap is not None:
        logits = cap * jnp.tanh(logits / cap)
    return logits


def _block_mlp(x, blk, cfg, interpret=None):
    h = _rms_norm(x, blk["pre_mlp_norm"], cfg.rms_eps)
    gate = _proj(h, blk["w_gate"], interpret)
    up = _proj(h, blk["w_up"], interpret)
    # GeGLU with the tanh-approximate gelu (HF gelu_pytorch_tanh)
    act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True) * up.astype(
        jnp.float32
    )
    down = _proj(act.astype(x.dtype), blk["w_down"], interpret)
    return x + _rms_norm(down, blk["post_mlp_norm"], cfg.rms_eps)


def forward(params, tokens, cfg: Gemma2Config, *, positions=None,
            interpret=None):
    """tokens [B, S] -> logits [B, S, V] (causal; final logits capped)."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    x = _embed(params, tokens, cfg)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    scale = cfg.query_pre_attn_scalar ** -0.5
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(
            b, s, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)  # q rotates in-kernel
        attn = flash_attention(
            q, k, v, causal=True, scale=scale, window=_wnd(cfg, i),
            logit_softcap=cfg.attn_logit_softcap,
            rope_cos=cos, rope_sin=sin, interpret=interpret,
        )
        attn = _proj(
            attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk["wo"],
            interpret,
        )
        x = x + _rms_norm(attn, blk["post_attn_norm"], cfg.rms_eps)
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    return _final_logits(params, x, cfg, interpret)


def prefill_with_kv(params, tokens, positions, cfg: Gemma2Config, *,
                    interpret=None):
    """Engine-adapter prefill: logits [1, S, V] + per-layer rope'd KV."""
    b, s = tokens.shape
    x = _embed(params, tokens, cfg)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    scale = cfg.query_pre_attn_scalar ** -0.5
    kvs = []
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(
            b, s, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        k = apply_rope(k, cos, sin)
        kvs.append((k, v))
        attn = flash_attention(
            q, k, v, causal=True, scale=scale, window=_wnd(cfg, i),
            logit_softcap=cfg.attn_logit_softcap,
            rope_cos=cos, rope_sin=sin,
            softmax_mode="clamped", interpret=interpret,
        )
        attn = _proj(
            attn.reshape(b, s, cfg.num_heads * cfg.head_dim), blk["wo"],
            interpret,
        )
        x = x + _rms_norm(attn, blk["post_attn_norm"], cfg.rms_eps)
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    return _final_logits(params, x, cfg, interpret), kvs


def decode_step(params, token, cfg: Gemma2Config, cache: KVCache, *,
                interpret=None):
    """One cached decode step: token [B] -> (logits [B, V], cache)."""
    b = token.shape[0]
    x = _embed(params, token[:, None], cfg)
    cos, sin = rope_cos_sin(cache.length[:, None], cfg.head_dim,
                            cfg.rope_theta)
    scale = cfg.query_pre_attn_scalar ** -0.5
    for i, blk in enumerate(params["blocks"]):
        h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = _proj(h, blk["wq"], interpret).reshape(
            b, 1, cfg.num_heads, cfg.head_dim)
        k = _proj(h, blk["wk"], interpret).reshape(
            b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(h, blk["wv"], interpret).reshape(
            b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(i, k, v)
        kc, vc, ks, vs = cache.layer(i)
        attn = flash_decode(
            q[:, 0], kc, vc, k_scale=ks, v_scale=vs,
            kv_length=cache.length + 1, kv_layout="bhsd", scale=scale,
            window=_dec_wnd(cfg, i),
            logit_softcap=cfg.attn_logit_softcap, interpret=interpret,
            **cache.scale_args(),
        )
        attn = _proj(
            attn.reshape(b, 1, cfg.num_heads * cfg.head_dim), blk["wo"],
            interpret,
        )
        x = x + _rms_norm(attn, blk["post_attn_norm"], cfg.rms_eps)
        x = _block_mlp(x, blk, cfg, interpret=interpret)
    cache = cache.advance(1)
    return _final_logits(params, x[:, 0], cfg, interpret), cache


def make_cache(cfg: Gemma2Config, batch, capacity, mode="none", dtype=None):
    return KVCache.create(
        cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.dtype(dtype or cfg.dtype), mode=mode,
    )


def make_adapter(cfg: Gemma2Config, *, interpret=None, eos_token=None):
    """Engine adapter (continuous batching / serving)."""
    from flash_attn_tpu.engine.engine import ModelAdapter

    return ModelAdapter(
        prefill_with_kv=lambda p, t, pos: prefill_with_kv(
            p, t, pos, cfg, interpret=interpret
        ),
        decode_step=lambda p, t, c: decode_step(
            p, t, cfg, c, interpret=interpret
        ),
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        eos_token=eos_token,
    )


def quantize_weights(params, mode="int8", group_size=128):
    """Weight-only quantization of every projection (same scheme as
    models/llama.quantize_weights)."""
    from flash_attn_tpu.models.llama import quantize_weights as _qw

    return _qw(params, mode=mode, group_size=group_size)


# --- HF weight conversion (tests/test_hf_parity.py validates token-exact) ---

def convert_hf_state_dict(sd: dict, dtype="float32"):
    """Convert a HF ``Gemma2ForCausalLM`` state dict (numpy values) into this
    module's param pytree + config.  Linear weights are [out, in] in torch —
    transposed here; norm weights stay zero-centered (the (1+w) gain is
    applied in _rms_norm)."""
    dt = jnp.dtype(dtype)

    def g(name):
        return jnp.asarray(sd[name], dt)

    emb = g("model.embed_tokens.weight")
    vocab, hidden = emb.shape
    num_layers = 0
    while f"model.layers.{num_layers}.self_attn.q_proj.weight" in sd:
        num_layers += 1
    wq0 = sd["model.layers.0.self_attn.q_proj.weight"]
    wk0 = sd["model.layers.0.self_attn.k_proj.weight"]
    blocks = []
    for i in range(num_layers):
        pre = f"model.layers.{i}."
        blocks.append({
            "attn_norm": g(pre + "input_layernorm.weight"),
            "post_attn_norm": g(pre + "post_attention_layernorm.weight"),
            "wq": g(pre + "self_attn.q_proj.weight").T,
            "wk": g(pre + "self_attn.k_proj.weight").T,
            "wv": g(pre + "self_attn.v_proj.weight").T,
            "wo": g(pre + "self_attn.o_proj.weight").T,
            "pre_mlp_norm": g(pre + "pre_feedforward_layernorm.weight"),
            "post_mlp_norm": g(pre + "post_feedforward_layernorm.weight"),
            "w_gate": g(pre + "mlp.gate_proj.weight").T,
            "w_up": g(pre + "mlp.up_proj.weight").T,
            "w_down": g(pre + "mlp.down_proj.weight").T,
        })
    params = {
        "tok_emb": emb,
        "blocks": blocks,
        "final_norm": g("model.norm.weight"),
    }
    return params, (vocab, hidden, num_layers, wq0.shape[0], wk0.shape[0])


def load_hf(model_name: str = "google/gemma-2-9b", dtype="bfloat16"):
    """Convert a downloaded HF checkpoint (zero-egress images: use
    convert_hf_state_dict on a locally constructed model instead)."""
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, _ = convert_hf_state_dict(sd, dtype=dtype)
    c = model.config
    cfg = Gemma2Config(
        vocab_size=c.vocab_size, hidden=c.hidden_size,
        intermediate=c.intermediate_size, num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads, num_kv_heads=c.num_key_value_heads,
        head_dim=c.head_dim, rope_theta=c.rope_theta,
        rms_eps=c.rms_norm_eps, max_position=c.max_position_embeddings,
        dtype=dtype, sliding_window=c.sliding_window,
        query_pre_attn_scalar=float(c.query_pre_attn_scalar),
        attn_logit_softcap=c.attn_logit_softcapping,
        final_logit_softcap=c.final_logit_softcapping,
    )
    return params, cfg
