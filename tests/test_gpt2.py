"""End-to-end GPT-2 slice (BASELINE.json config 0): cached decode must match
full-sequence recompute; INT8 KV must stay close to float KV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models import gpt2


@pytest.fixture(scope="module")
def tiny():
    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits = gpt2.forward(params, tokens, cfg, interpret=True)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_cached_decode_matches_full_forward(tiny):
    """Prefill+decode through the KV cache == argmax of the full forward at
    every step (teacher forcing with the generated tokens)."""
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    steps = 6
    gen = gpt2.greedy_decode(params, prompt, cfg, steps=steps, interpret=True)
    assert gen.shape == (1, steps)

    # oracle: recompute from scratch with full attention each step
    seq = prompt
    oracle_toks = []
    for _ in range(steps):
        logits = gpt2.forward(params, seq, cfg, interpret=True)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        oracle_toks.append(nxt)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    oracle_toks = jnp.stack(oracle_toks, axis=1)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(oracle_toks))


def test_int8_kv_decode_close_to_float(tiny):
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, cfg.vocab_size)
    gen_f = gpt2.greedy_decode(params, prompt, cfg, steps=8, kv_mode="none", interpret=True)
    gen_q = gpt2.greedy_decode(params, prompt, cfg, steps=8, kv_mode="int8", interpret=True)
    # random-weight logits are near-uniform so argmax can flip; require most
    # tokens to agree (perplexity-level tests run on real weights in bench)
    agree = float(np.mean(np.asarray(gen_f) == np.asarray(gen_q)))
    assert agree >= 0.5, (gen_f, gen_q)


def test_prefill_then_decode_logit_consistency(tiny):
    """Logits from (prefill prompt, decode 1) == logits from full forward."""
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 12), 0, cfg.vocab_size)
    cache = gpt2.make_cache(cfg, 2, 32)
    logits_pf, cache = gpt2.prefill(params, prompt, cfg, cache, interpret=True)
    full = gpt2.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(logits_pf), np.asarray(full[:, -1]), atol=2e-3, rtol=2e-3
    )
    # one decode step vs forward on prompt+tok
    tok = jnp.argmax(logits_pf, -1)
    logits_d, cache = gpt2.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = gpt2.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(full2[:, -1]), atol=2e-3, rtol=2e-3
    )


def test_decode_multi_matches_sequential_steps():
    """GPT-2 decode_multi (speculative verify step) == T sequential
    decode_steps."""
    from flash_attn_tpu.engine.kv_cache import KVCache

    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    B, T = 2, 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 6), 0, cfg.vocab_size)
    toks = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size)

    def make():
        cache = KVCache.create(
            cfg.num_layers, B, 64, cfg.num_heads,
            cfg.hidden // cfg.num_heads, dtype=jnp.float32,
        )
        pos = jnp.arange(prompt.shape[1])[None]
        _, kvs = gpt2.prefill_with_kv(params, prompt, pos, cfg, interpret=True)
        for i, (k, v) in enumerate(kvs):
            cache = cache.append(i, k, v)
        return cache.advance(prompt.shape[1])

    cache_a, cache_b = make(), make()
    logits_multi, cache_a = gpt2.decode_multi(params, toks, cfg, cache_a,
                                              interpret=True)
    seq = []
    for t in range(T):
        lg, cache_b = gpt2.decode_step(params, toks[:, t], cfg, cache_b,
                                       interpret=True)
        seq.append(lg)
    np.testing.assert_allclose(np.asarray(logits_multi),
                               np.asarray(jnp.stack(seq, axis=1)),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache_a.length),
                                  np.asarray(cache_b.length))


def test_engine_speculative_gpt2_matches_greedy():
    """Spec decoding with the GPT-2 adapter is greedy-exact too."""
    from flash_attn_tpu.engine.engine import InferenceEngine, SpecConfig

    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    outs = []
    for spec in (None, SpecConfig(num_draft=3, ngram=2)):
        eng = InferenceEngine(
            params, gpt2.make_adapter(cfg, interpret=True),
            max_batch=1, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
            spec=spec,
        )
        r = eng.submit(prompt, max_tokens=6)
        eng.run()
        assert r.done
        outs.append(list(r.generated))
    assert outs[0] == outs[1]
