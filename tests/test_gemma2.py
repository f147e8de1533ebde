"""Gemma-2 family: sandwich norms, GeGLU, alternating sliding/full layers,
attention + final logit softcaps — all through the flash kernels, validated
against HF ``Gemma2ForCausalLM`` built from config with random init (the
zero-egress conversion-validation pattern of tests/test_hf_parity.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_tpu.models import gemma2


@pytest.fixture(scope="module")
def tiny():
    cfg = gemma2.GEMMA2_TINY
    params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_finite(tiny):
    cfg, params = tiny
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, cfg.vocab_size)
    logits = gemma2.forward(params, toks, cfg, interpret=True)
    assert logits.shape == (2, 24, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # final logits capped
    assert float(jnp.max(jnp.abs(logits))) <= cfg.final_logit_softcap + 1e-3


def test_cached_decode_matches_forward(tiny):
    """Prompt longer than the sliding window so the alternating local/global
    layers actually diverge and the windowed decode must agree with the
    windowed forward."""
    cfg, params = tiny
    assert cfg.sliding_window < 24
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 24), 0,
                                cfg.vocab_size)
    logits_all, kvs = gemma2.prefill_with_kv(
        params, prompt, jnp.arange(24)[None], cfg, interpret=True
    )
    full = gemma2.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(full), atol=2e-3, rtol=2e-3
    )

    cache = gemma2.make_cache(cfg, 1, 64)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(24)
    tok = jnp.argmax(logits_all[:, -1], -1)
    for _ in range(3):
        logits_d, cache = gemma2.decode_step(params, tok, cfg, cache,
                                             interpret=True)
        prompt = jnp.concatenate([prompt, tok[:, None]], 1)
        full2 = gemma2.forward(params, prompt, cfg, interpret=True)
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(full2[:, -1]),
            atol=5e-3, rtol=5e-3,
        )
        tok = jnp.argmax(logits_d, -1)


def test_sliding_vs_global_layers_differ(tiny):
    """The even (sliding) layers must actually restrict attention: zeroing
    distant KV changes nothing for a 1-layer sliding config but does for a
    global one."""
    import dataclasses

    cfg, params = tiny
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0,
                              cfg.vocab_size)
    wide = dataclasses.replace(cfg, sliding_window=1000)
    out_narrow = gemma2.forward(params, toks, cfg, interpret=True)
    out_wide = gemma2.forward(params, toks, wide, interpret=True)
    # last position: window 16 vs unbounded must differ
    assert not np.allclose(
        np.asarray(out_narrow[:, -1]), np.asarray(out_wide[:, -1]), atol=1e-5
    )


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_gemma2():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    cfg = Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, sliding_window=16,
        query_pre_attn_scalar=16, rope_theta=10000.0,
        attn_implementation="eager",  # sdpa paths may skip the softcaps
    )
    model = Gemma2ForCausalLM(cfg).eval()
    return model


def test_gemma2_conversion_logits_match(torch_gemma2):
    sd = {k: v.detach().numpy() for k, v in torch_gemma2.state_dict().items()}
    params, _ = gemma2.convert_hf_state_dict(sd, dtype="float32")
    cfg = gemma2.GEMMA2_TINY

    tokens = np.random.RandomState(1).randint(0, 512, size=(2, 24))
    with torch.no_grad():
        want = torch_gemma2(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(
        gemma2.forward(params, jnp.asarray(tokens), cfg, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_gemma2_greedy_tokens_match_hf(torch_gemma2):
    sd = {k: v.detach().numpy() for k, v in torch_gemma2.state_dict().items()}
    params, _ = gemma2.convert_hf_state_dict(sd, dtype="float32")
    cfg = gemma2.GEMMA2_TINY

    prompt = np.random.RandomState(2).randint(0, 512, size=(1, 20))
    steps = 8
    with torch.no_grad():
        hf_out = torch_gemma2.generate(
            torch.tensor(prompt), max_new_tokens=steps, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1]:]

    logits_all, kvs = gemma2.prefill_with_kv(
        params, jnp.asarray(prompt), jnp.arange(prompt.shape[1])[None], cfg,
        interpret=True,
    )
    cache = gemma2.make_cache(cfg, 1, 64)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(prompt.shape[1])
    tok = jnp.argmax(logits_all[:, -1], -1)
    ours = [int(tok[0])]
    for _ in range(steps - 1):
        logits, cache = gemma2.decode_step(params, tok, cfg, cache,
                                           interpret=True)
        tok = jnp.argmax(logits, -1)
        ours.append(int(tok[0]))
    assert ours == hf_out.tolist(), (ours, hf_out.tolist())
