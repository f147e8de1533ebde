"""Mixtral MoE model family: routing semantics, cached decode consistency,
HF conversion parity, weight quantization, engine integration, and the
expert-parallel (EP) sharded MoE layer vs the dense oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_tpu.models import mixtral as mx


@pytest.fixture(scope="module")
def tiny():
    cfg = mx.MIXTRAL_TINY
    params = mx.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_finite_and_routed(tiny):
    cfg, params = tiny
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits = mx.forward(params, tokens, cfg, interpret=True)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_router_topk_sparsity(tiny):
    cfg, _ = tiny
    from flash_attn_tpu.parallel.moe import router_topk

    logits = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.num_experts))
    w = np.asarray(router_topk(logits, cfg.top_k))
    assert ((w > 0).sum(-1) == cfg.top_k).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_cached_decode_matches_forward(tiny):
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, cfg.vocab_size)
    logits_all, kvs = mx.prefill_with_kv(
        params, prompt, jnp.arange(8)[None], cfg, interpret=True
    )
    full = mx.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(full), atol=2e-3, rtol=2e-3
    )
    cache = mx.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(8)
    tok = jnp.argmax(logits_all[:, -1], -1)
    logits_d, cache = mx.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = mx.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(full2[:, -1]), atol=5e-3, rtol=5e-3
    )


@pytest.mark.parametrize("mode", ["int8", "int4", "w8a8", "w4a8"])
def test_quantized_experts_forward_close(tiny, mode):
    cfg, params = tiny
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 12), 0, cfg.vocab_size)
    base = mx.forward(params, tokens, cfg, interpret=True)
    qp = mx.quantize_weights(params, mode=mode, group_size=32)
    if mode == "w8a8":
        # same jit-safe pytree class as llama's quantize_weights (the
        # legacy string-tagged tuple cannot ride as a jit argument)
        from flash_attn_tpu.ops.matmul import W8A8Weight

        assert isinstance(qp["blocks"][0]["wq"], W8A8Weight)
        assert isinstance(qp["blocks"][0]["experts"][0]["w_gate"], W8A8Weight)
    got = mx.forward(qp, tokens, cfg, interpret=True)
    # logits are pre-softmax; quantization noise is bounded, not tiny
    err = float(jnp.max(jnp.abs(got - base)))
    scale = float(jnp.max(jnp.abs(base)))
    assert err < 0.15 * max(scale, 1.0), (err, scale)


def test_hf_conversion_logits_match():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig as HFMixtralConfig
    from transformers import MixtralForCausalLM

    torch.manual_seed(5)
    hf_cfg = HFMixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
    )
    model = MixtralForCausalLM(hf_cfg).eval()
    params, cfg = mx.convert_hf_model(model, dtype="float32")
    assert cfg.num_experts == 4 and cfg.top_k == 2

    # rebuild the torch model (convert_hf_model consumed it) via state dict
    torch.manual_seed(5)
    model = MixtralForCausalLM(hf_cfg).eval()
    tokens = np.random.RandomState(6).randint(0, 256, size=(1, 16))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(mx.forward(params, jnp.asarray(tokens), cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)


def test_engine_runs_mixtral(tiny):
    from flash_attn_tpu.engine.engine import InferenceEngine

    cfg, params = tiny
    eng = InferenceEngine(
        params, mx.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    r1 = eng.submit([1, 2, 3, 4], max_tokens=4)
    r2 = eng.submit([9, 8, 7], max_tokens=3)
    eng.run()
    assert r1.done and len(r1.generated) == 4
    assert r2.done and len(r2.generated) == 3


def test_moe_ep_matches_dense(tiny):
    """EP-sharded MoE layer (experts over a 4-device axis, psum combine)
    == the model's dense _moe_mlp, exactly the same routing."""
    from jax.sharding import Mesh
    from flash_attn_tpu.parallel.moe import make_moe_ffn

    cfg, params = tiny
    blk = params["blocks"][0]
    router, wg, wu, wd = mx.stack_experts(blk)
    x = jax.random.normal(jax.random.PRNGKey(7), (16, cfg.hidden))

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("tp",))
    ep = make_moe_ffn(mesh, top_k=cfg.top_k)
    got = ep(x, router, wg, wu, wd)

    # dense oracle through the model's own mlp (strip the norm + residual)
    from flash_attn_tpu.parallel.moe import moe_ffn_reference

    want = moe_ffn_reference(x, router, wg, wu, wd, top_k=cfg.top_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sliding_window_decode_matches_forward():
    """cfg.sliding_window: prefill (fwd-kernel window mask) and cached
    decode (flash_decode window) agree end-to-end, and the window actually
    changes the result vs global attention."""
    import dataclasses

    cfg = dataclasses.replace(mx.MIXTRAL_TINY, sliding_window=6)
    params = mx.init_params(cfg, jax.random.PRNGKey(7))
    prompt = jax.random.randint(jax.random.PRNGKey(8), (1, 12), 0, cfg.vocab_size)

    logits_all, kvs = mx.prefill_with_kv(
        params, prompt, jnp.arange(12)[None], cfg, interpret=True
    )
    full = mx.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_all), np.asarray(full),
                               atol=2e-3, rtol=2e-3)
    # windowed differs from global at positions past the window
    cfg_glob = dataclasses.replace(cfg, sliding_window=None)
    glob = mx.forward(params, prompt, cfg_glob, interpret=True)
    assert float(jnp.max(jnp.abs(full[:, -1] - glob[:, -1]))) > 1e-4

    cache = mx.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(12)
    tok = jnp.argmax(logits_all[:, -1], -1)
    logits_d, cache = mx.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = mx.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(full2[:, -1]),
                               atol=5e-3, rtol=5e-3)


def test_paged_engine_runs_mixtral(tiny):
    """PagedInferenceEngine over the MoE family (paged MoE serving) matches
    the contiguous engine's greedy tokens."""
    from flash_attn_tpu.engine.engine import InferenceEngine, PagedInferenceEngine

    cfg, params = tiny
    adapter = mx.make_adapter(cfg, interpret=True)
    eng_p = PagedInferenceEngine(params, adapter, max_batch=2, capacity=32,
                                 page_size=8, cache_dtype=jnp.dtype(cfg.dtype))
    eng_c = InferenceEngine(params, adapter, max_batch=2, capacity=32,
                            cache_dtype=jnp.dtype(cfg.dtype))
    for prompt in ([1, 2, 3, 4], [9, 8, 7]):
        rp = eng_p.submit(prompt, max_tokens=4)
        rc = eng_c.submit(prompt, max_tokens=4)
        eng_p.run(); eng_c.run()
        assert rp.done and rc.done
        np.testing.assert_array_equal(np.asarray(rp.generated),
                                      np.asarray(rc.generated))


def test_decode_multi_matches_steps_mixtral(tiny):
    cfg, params = tiny
    B, T = 2, 3
    prompt = jax.random.randint(jax.random.PRNGKey(20), (B, 6), 0, cfg.vocab_size)
    toks = jax.random.randint(jax.random.PRNGKey(21), (B, T), 0, cfg.vocab_size)

    def prefill(cache):
        _, kvs = mx.prefill_with_kv(params, prompt, jnp.arange(6)[None], cfg,
                                    interpret=True)
        for i, (k, v) in enumerate(kvs):
            cache = cache.append(i, k, v)
        return cache.advance(6)

    ca = prefill(mx.make_cache(cfg, B, 32))
    cb = prefill(mx.make_cache(cfg, B, 32))
    lm, ca = mx.decode_multi(params, toks, cfg, ca, interpret=True)
    seq = []
    for t in range(T):
        lg, cb = mx.decode_step(params, toks[:, t], cfg, cb, interpret=True)
        seq.append(lg)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(jnp.stack(seq, 1)),
                               atol=2e-4, rtol=2e-4)
