"""Llama family: cached decode vs full forward, quantized weights, RoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models import llama


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_finite(tiny):
    cfg, params = tiny
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits = llama.forward(params, toks, cfg, interpret=True)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_rope_rotation_properties():
    # position 0 is identity; equal positions preserve inner products
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 32))
    pos = jnp.zeros((1, 4), jnp.int32)
    cos, sin = llama.rope_cos_sin(pos, 32, 10000.0)
    np.testing.assert_allclose(
        np.asarray(llama.apply_rope(x, cos, sin)), np.asarray(x), atol=1e-6
    )
    # relative property: <R(p)q, R(p+k)v> depends only on k
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 32))
    v = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1, 32))

    def dot_at(p):
        pos_q = jnp.full((1, 1), p, jnp.int32)
        pos_v = jnp.full((1, 1), p + 5, jnp.int32)
        cq, sq = llama.rope_cos_sin(pos_q, 32, 10000.0)
        cv, sv = llama.rope_cos_sin(pos_v, 32, 10000.0)
        qr = llama.apply_rope(q, cq, sq)
        vr = llama.apply_rope(v, cv, sv)
        return float(jnp.sum(qr * vr))

    assert abs(dot_at(0) - dot_at(7)) < 1e-4


def test_cached_decode_matches_forward(tiny):
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, cfg.vocab_size)
    cache = llama.make_cache(cfg, 1, 32)
    # prefill via engine-adapter path, then one decode step
    logits_all, kvs = llama.prefill_with_kv(
        params, prompt, jnp.arange(8)[None], cfg, interpret=True
    )
    full = llama.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(full), atol=2e-3, rtol=2e-3
    )
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(8)
    tok = jnp.argmax(logits_all[:, -1], -1)
    logits_d, cache = llama.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = llama.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(full2[:, -1]), atol=5e-3, rtol=5e-3
    )


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_weights_forward_close(tiny, mode):
    cfg, params = tiny
    toks = jax.random.randint(jax.random.PRNGKey(6), (1, 16), 0, cfg.vocab_size)
    full = llama.forward(params, toks, cfg, interpret=True)
    qparams = llama.quantize_weights(params, mode=mode, group_size=64)
    qlogits = llama.forward(qparams, toks, cfg, interpret=True)
    # per-token top-1 agreement is the meaningful metric
    agree = float(
        np.mean(np.argmax(np.asarray(full), -1) == np.argmax(np.asarray(qlogits), -1))
    )
    assert agree > 0.7, agree
    assert bool(jnp.all(jnp.isfinite(qlogits)))


def test_llama_engine_chunked_prefill():
    """Chunked prefill through the Llama adapter matches the whole-prompt
    engine path (the BASELINE config-2 prefill path, engine-level)."""
    from flash_attn_tpu.engine.engine import InferenceEngine
    from flash_attn_tpu.models import llama as ll
    import numpy as np

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(1, 19))

    def run(chunk):
        eng = InferenceEngine(
            params, ll.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
            prefill_chunk_size=chunk,
        )
        req = eng.submit(prompt, max_tokens=4)
        eng.run()
        assert req.done
        return req.generated

    np.testing.assert_array_equal(np.asarray(run(8)), np.asarray(run(None)))


def test_decode_multi_matches_sequential_steps(tiny):
    """decode_multi (the speculative verify step) produces the same logits
    and cache state as T sequential decode_steps."""
    cfg, params = tiny
    B, T = 2, 3
    prompt = jax.random.randint(jax.random.PRNGKey(9), (B, 8), 0, cfg.vocab_size)
    toks = jax.random.randint(jax.random.PRNGKey(10), (B, T), 0, cfg.vocab_size)

    def prefill(cache):
        pos = jnp.arange(prompt.shape[1])[None]
        _, kvs = llama.prefill_with_kv(params, prompt[:1] * 0 + prompt, pos,
                                       cfg, interpret=True)
        for i, (k, v) in enumerate(kvs):
            cache = cache.append(i, k, v)
        return cache.advance(prompt.shape[1])

    cache_a = prefill(llama.make_cache(cfg, B, 64))
    cache_b = prefill(llama.make_cache(cfg, B, 64))

    logits_multi, cache_a = llama.decode_multi(params, toks, cfg, cache_a,
                                               interpret=True)
    seq_logits = []
    for t in range(T):
        lg, cache_b = llama.decode_step(params, toks[:, t], cfg, cache_b,
                                        interpret=True)
        seq_logits.append(lg)
    logits_seq = jnp.stack(seq_logits, axis=1)

    np.testing.assert_allclose(np.asarray(logits_multi),
                               np.asarray(logits_seq), atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache_a.length),
                                  np.asarray(cache_b.length))
    np.testing.assert_allclose(np.asarray(cache_a.k, np.float32),
                               np.asarray(cache_b.k, np.float32),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "group_size,tp",
    [(64, 4),    # group 64 -> 'halves' packing
     (128, 2)],  # group 128 -> auto 'planes' packing; tp=2 keeps K//g % tp == 0
)
def test_llama_70b_structure_tp_int4_fp8_decode(group_size, tp):
    """BASELINE config 4 shape on the virtual mesh: a 70B-STRUCTURE model
    (GQA 8:1 like 70B's 64/8 heads, scaled dims) with
    INT4 weights and an FP8 KV cache, TP-sharded over the mesh
    (parallel.tp.shard_params_quant) — sharded decode logits must match the
    unsharded quantized model's.  The group_size=128 case exercises the
    'planes' Int4Weight layout surviving the shard (the layout field must
    ride through place_weight's reconstruction)."""
    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.tp import shard_params_quant

    cfg = llama.LlamaConfig(
        vocab_size=512, hidden=256, intermediate=1024, num_layers=2,
        num_heads=8, num_kv_heads=1, head_dim=32, max_position=128,
        rope_theta=500000.0, dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(50))
    qparams = llama.quantize_weights(params, mode="int4", group_size=group_size)
    if group_size == 128:
        from flash_attn_tpu.ops.quant import Int4Weight
        layouts = {w.layout for w in jax.tree.leaves(
            qparams, is_leaf=lambda x: isinstance(x, Int4Weight))
            if isinstance(w, Int4Weight)}
        assert "planes" in layouts  # the auto-layout this case is about

    B, T = 2, 16
    toks = jax.random.randint(jax.random.PRNGKey(51), (B, T), 0, cfg.vocab_size)
    tok_next = jax.random.randint(jax.random.PRNGKey(52), (B,), 0, cfg.vocab_size)

    def run(p):
        cache = llama.make_cache(cfg, B, 64, mode="fp8")
        logits, kvs = llama.prefill_with_kv(
            p, toks, jnp.arange(T)[None], cfg, interpret=True
        )
        for i, (k, v) in enumerate(kvs):
            cache = cache.append(i, k, v)
        cache = cache.advance(T)
        step, cache = llama.decode_step(p, tok_next, cfg, cache, interpret=True)
        return logits, step

    want_l, want_s = run(qparams)

    mesh = make_mesh(MeshConfig(tp=tp))
    sharded = shard_params_quant(qparams, mesh)
    got_l, got_s = jax.jit(run)(sharded)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-3, rtol=2e-3)


def test_llama_sliding_window_decode_matches_forward():
    """LlamaConfig.sliding_window: windowed prefill and cached decode agree
    end-to-end, and differ from global attention past the window."""
    import dataclasses

    cfg = dataclasses.replace(llama.LLAMA_TINY, sliding_window=6)
    params = llama.init_params(cfg, jax.random.PRNGKey(70))
    prompt = jax.random.randint(jax.random.PRNGKey(71), (1, 12), 0, cfg.vocab_size)

    logits_all, kvs = llama.prefill_with_kv(
        params, prompt, jnp.arange(12)[None], cfg, interpret=True
    )
    full = llama.forward(params, prompt, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_all), np.asarray(full),
                               atol=2e-3, rtol=2e-3)
    glob = llama.forward(
        params, prompt, dataclasses.replace(cfg, sliding_window=None),
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(full[:, -1] - glob[:, -1]))) > 1e-4

    cache = llama.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(12)
    tok = jnp.argmax(logits_all[:, -1], -1)
    logits_d, cache = llama.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = llama.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(full2[:, -1]),
                               atol=5e-3, rtol=5e-3)


def test_llama_attn_logit_softcap_decode_matches_forward():
    """Gemma-2-style attn softcap wired through forward, prefill and cached
    decode consistently (config knob -> in-kernel cap on every path)."""
    import dataclasses

    cfg = llama.LlamaConfig(
        vocab_size=128, hidden=64, intermediate=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=64,
        rope_theta=10000.0, dtype="float32", attn_logit_softcap=0.25,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(40))
    # boost q projections so attention scores are large enough for the cap
    # to bite (tiny-init scores sit in tanh's linear region)
    for blk in params["blocks"]:
        blk["wq"] = blk["wq"] * 30.0
    prompt = jax.random.randint(jax.random.PRNGKey(41), (1, 8), 0, 128)

    full = llama.forward(params, prompt, cfg, interpret=True)
    # capping must actually change the logits vs the uncapped config
    cfg_off = dataclasses.replace(cfg, attn_logit_softcap=None)
    full_off = llama.forward(params, prompt, cfg_off, interpret=True)
    diff = float(np.max(np.abs(np.asarray(full) - np.asarray(full_off))))
    assert diff > 1e-3, diff

    logits_all, kvs = llama.prefill_with_kv(
        params, prompt, jnp.arange(8)[None], cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(full), atol=2e-3, rtol=2e-3
    )
    cache = llama.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(8)
    tok = jnp.argmax(logits_all[:, -1], -1)
    logits_d, cache = llama.decode_step(params, tok, cfg, cache, interpret=True)
    full2 = llama.forward(
        params, jnp.concatenate([prompt, tok[:, None]], 1), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_d), np.asarray(full2[:, -1]), atol=5e-3, rtol=5e-3
    )


@pytest.mark.parametrize("mode", [None, "int8", "int4", "w8a8"])
def test_fused_projections_exact(tiny, mode):
    """fuse_projections (wqkv / w_gate_up single-matmul blocks) is
    numerically equivalent to the unfused tree on forward AND cached
    decode, for every weight scheme — the schemes' scales are
    column-independent, so concat-along-N changes nothing but the number
    of kernel calls (ops/matmul.concat_weights)."""
    cfg, params = tiny
    p = (
        params if mode is None
        else llama.quantize_weights(params, mode=mode, group_size=32)
    )
    pf = llama.fuse_projections(p)
    toks = jax.random.randint(
        jax.random.PRNGKey(7), (2, 16), 0, cfg.vocab_size
    )
    a = llama.forward(p, toks, cfg, interpret=True)
    b = llama.forward(pf, toks, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=1e-4, rtol=1e-4,
    )

    tok = jnp.ones((2,), jnp.int32)
    la, _ = llama.decode_step(
        p, tok, cfg, llama.make_cache(cfg, 2, 64, mode="int8"),
        interpret=True,
    )
    lb, _ = llama.decode_step(
        pf, tok, cfg, llama.make_cache(cfg, 2, 64, mode="int8"),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(la, np.float32), np.asarray(lb, np.float32),
        atol=1e-4, rtol=1e-4,
    )


def test_fuse_projections_idempotent_and_tp_rejects_fused(tiny):
    """Re-fusing an already-fused tree is a no-op (no KeyError), and
    shard_params_quant refuses fused trees instead of silently replicating
    wqkv/w_gate_up (which would defeat TP)."""
    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.tp import shard_params_quant

    cfg, params = tiny
    pf = llama.fuse_projections(params)
    pff = llama.fuse_projections(pf)
    la = jax.tree.leaves(pf)
    lb = jax.tree.leaves(pff)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mesh = make_mesh(MeshConfig(tp=2))
    with pytest.raises(ValueError, match="fused projection"):
        shard_params_quant(pf, mesh)


def test_fuse_projections_quantize_order_invariant(tiny):
    cfg, params = tiny
    a = llama.fuse_projections(llama.quantize_weights(params, mode="int8"))
    b = llama.quantize_weights(llama.fuse_projections(params), mode="int8")
    tok = jnp.ones((2,), jnp.int32)
    la, _ = llama.decode_step(
        a, tok, cfg, llama.make_cache(cfg, 2, 64, mode="int8"),
        interpret=True,
    )
    lb, _ = llama.decode_step(
        b, tok, cfg, llama.make_cache(cfg, 2, 64, mode="int8"),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(la, np.float32), np.asarray(lb, np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_quantize_head_mode_override(tiny):
    """head_mode quantizes the LM head with a different scheme than the
    layer weights (the decode bench's serving mode: int8 layers + w8a8
    head — the head is the one large-N matmul where the cast-free s8xs8
    path wins; docs/BENCHMARKS.md r4)."""
    from flash_attn_tpu.ops.matmul import W8A8Weight

    cfg, params = tiny
    qp = llama.quantize_weights(
        params, mode="int8", skip=("tok_emb",), head_mode="w8a8"
    )
    assert isinstance(qp["lm_head"], W8A8Weight)
    assert isinstance(qp["blocks"][0]["wq"], tuple)  # int8 (vals, scales)
    toks = jax.random.randint(
        jax.random.PRNGKey(9), (1, 16), 0, cfg.vocab_size
    )
    full = llama.forward(params, toks, cfg, interpret=True)
    qlogits = llama.forward(qp, toks, cfg, interpret=True)
    agree = float(np.mean(
        np.argmax(np.asarray(full), -1) == np.argmax(np.asarray(qlogits), -1)
    ))
    assert agree > 0.7, agree
