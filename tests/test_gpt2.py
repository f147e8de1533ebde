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
