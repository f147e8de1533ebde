"""Perplexity-delta harness (SURVEY.md §4.2): model-quality impact of KV and
weight quantization, measured as teacher-forced NLL of a continuation.

KV quantization only acts on the *decode* path (quantize-on-append,
dequant-in-kernel), so the harness scores a continuation token-by-token
through prefill + decode_step with the cache in each mode — not via the
full-sequence forward, which never touches the cache.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def decode_nll(params, cfg, prompt, continuation, *, kv_mode="none",
               module=None, interpret=None) -> float:
    """Mean negative log-likelihood (nats/token) of ``continuation`` given
    ``prompt``, decoding with the KV cache in ``kv_mode``.

    prompt/continuation: 1-D int arrays; module: a model module exposing
    make_cache/prefill/decode_step with the gpt2.py signature (default
    flash_attn_tpu.models.gpt2).
    """
    if module is None:
        from flash_attn_tpu.models import gpt2 as module

    prompt = jnp.asarray(prompt, jnp.int32)[None]
    cont = [int(t) for t in continuation]
    capacity = prompt.shape[1] + len(cont) + 1
    cache = module.make_cache(cfg, 1, capacity, mode=kv_mode)
    logits, cache = module.prefill(params, prompt, cfg, cache,
                                   interpret=interpret)
    nll = 0.0
    tok = None
    for t in cont:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll -= float(logp[0, t])
        tok = jnp.asarray([t], jnp.int32)
        logits, cache = module.decode_step(params, tok, cfg, cache,
                                           interpret=interpret)
    return nll / max(len(cont), 1)


def kv_ppl_delta(params, cfg, prompt, continuation, *, modes=("int8", "fp8"),
                 module=None, interpret=None) -> dict:
    """Perplexity (e^nll) per KV mode and delta vs the float cache."""
    base = decode_nll(params, cfg, prompt, continuation, kv_mode="none",
                      module=module, interpret=interpret)
    out = {"none": {"nll": base, "ppl": math.exp(base), "delta_ppl": 0.0}}
    for mode in modes:
        nll = decode_nll(params, cfg, prompt, continuation, kv_mode=mode,
                         module=module, interpret=interpret)
        out[mode] = {
            "nll": nll,
            "ppl": math.exp(nll),
            "delta_ppl": math.exp(nll) - math.exp(base),
        }
    return out


def forward_nll(params, cfg, tokens, *, forward_fn=None,
                interpret=None) -> float:
    """Teacher-forced mean NLL over a full sequence (weight-quant harness:
    run with float vs quantized params and compare)."""
    if forward_fn is None:
        from flash_attn_tpu.models import gpt2 as m

        forward_fn = lambda p, t: m.forward(p, t, cfg, interpret=interpret)
    tokens = jnp.asarray(tokens, jnp.int32)[None]
    logits = forward_fn(params, tokens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[0, 1:]
    picked = jnp.take_along_axis(logp[0, :-1], tgt[:, None], axis=-1)
    return float(-jnp.mean(picked))
