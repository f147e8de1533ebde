"""Continuous-batching engine end-to-end on tiny GPT-2: requests admitted,
decoded, completed; outputs match direct greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.engine.engine import InferenceEngine
from flash_attn_tpu.engine.paged import PagedKVPool, paged_decode_attention
from flash_attn_tpu.engine.sampler import SamplingParams, sample
from flash_attn_tpu.engine.scheduler import ContinuousBatchingScheduler
from flash_attn_tpu.models import gpt2


@pytest.fixture(scope="module")
def tiny():
    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_scheduler_slot_lifecycle():
    s = ContinuousBatchingScheduler(max_batch=2)
    r1 = s.submit([1, 2], 4)
    r2 = s.submit([3], 4)
    r3 = s.submit([4], 2)
    admitted = s.admit()
    assert [r.uid for r in admitted] == [r1.uid, r2.uid]
    assert r3.slot is None and s.waiting
    # finish r1 -> r3 admitted into its slot
    s.complete(r1)
    admitted = s.admit()
    assert admitted == [r3]
    assert r3.slot == 0


def test_engine_single_request_matches_greedy(tiny):
    cfg, params = tiny
    prompt = list(range(1, 9))
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    req = eng.submit(prompt, max_tokens=5)
    eng.run()
    assert req.done and len(req.generated) == 5

    want = gpt2.greedy_decode(
        params, jnp.asarray([prompt]), cfg, steps=5, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(req.generated), np.asarray(want[0])
    )


def test_engine_continuous_batching_two_requests(tiny):
    cfg, params = tiny
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    p1, p2 = [1, 2, 3, 4], [7, 8, 9]
    r1 = eng.submit(p1, max_tokens=4)
    r2 = eng.submit(p2, max_tokens=6)
    eng.run()
    assert r1.done and r2.done
    w1 = gpt2.greedy_decode(params, jnp.asarray([p1]), cfg, steps=4, interpret=True)
    w2 = gpt2.greedy_decode(params, jnp.asarray([p2]), cfg, steps=6, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.generated), np.asarray(w1[0]))
    np.testing.assert_array_equal(np.asarray(r2.generated), np.asarray(w2[0]))


def test_engine_slot_reuse_more_requests_than_slots(tiny):
    cfg, params = tiny
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    reqs = [eng.submit([i + 1, i + 2], max_tokens=3) for i in range(5)]
    eng.run()
    assert all(r.done for r in reqs)
    for r in reqs:
        w = gpt2.greedy_decode(
            params, jnp.asarray([r.prompt]), cfg, steps=3, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(r.generated), np.asarray(w[0]))


def test_paged_pool_matches_contiguous():
    """Paged append+gather+decode == decode over a contiguous cache."""
    key = jax.random.PRNGKey(1)
    L, B, Hk, D = 2, 2, 2, 32
    page, npages, maxp = 8, 16, 4
    pool = PagedKVPool.create(L, npages, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])

    T = 20
    ks = jax.random.normal(key, (T, L, B, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(2), (T, L, B, Hk, D))
    for t in range(T):
        for l in range(L):
            pool = pool.append_token(l, ks[t, l], vs[t, l])
        pool = pool.advance(1)

    q = jax.random.normal(jax.random.PRNGKey(3), (B, 4, D))
    got = paged_decode_attention(pool, 0, q, interpret=True)

    from flash_attn_tpu.ops.decode import flash_decode

    k_contig = jnp.swapaxes(ks[:, 0], 0, 1)  # [B, T, Hk, D]
    v_contig = jnp.swapaxes(vs[:, 0], 0, 1)
    want = flash_decode(
        q, k_contig, v_contig, kv_length=jnp.full((B,), T, jnp.int32),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_sampler_modes():
    logits = jnp.asarray([[1.0, 5.0, 2.0, 0.0]])
    key = jax.random.PRNGKey(0)
    assert int(sample(logits, key, SamplingParams())[0]) == 1
    # top_k=1 == greedy regardless of temperature
    assert int(sample(logits, key, SamplingParams(temperature=2.0, top_k=1))[0]) == 1
    # top_p tiny == greedy
    assert int(sample(logits, key, SamplingParams(temperature=1.0, top_p=0.1))[0]) == 1
    # temperature sampling is within support
    t = int(sample(logits, key, SamplingParams(temperature=1.0))[0])
    assert 0 <= t < 4


def test_paged_pool_quantized_and_ragged():
    """Scalar-prefetch paged decode with int8 pages + per-sequence ragged
    lengths == contiguous quantized decode."""
    from flash_attn_tpu.ops.decode import flash_decode

    key = jax.random.PRNGKey(4)
    L, B, Hk, D = 1, 2, 2, 32
    page, npages, maxp = 8, 16, 4
    pool = PagedKVPool.create(
        L, npages, page, B, maxp, Hk, D, dtype=jnp.float32, mode="int8"
    )
    pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])

    lens = [20, 13]
    T = max(lens)
    ks = jax.random.normal(key, (T, B, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(5), (T, B, Hk, D))
    for t in range(T):
        pool = pool.append_token(0, ks[t], vs[t])
        pool = pool.advance(1)
    pool = pool.set_lengths(lens)

    q = jax.random.normal(jax.random.PRNGKey(6), (B, 4, D))
    got = paged_decode_attention(pool, 0, q, interpret=True)

    from flash_attn_tpu.ops.quant import quantize_kv

    k_contig = jnp.swapaxes(ks, 0, 1)  # [B, T, Hk, D]
    v_contig = jnp.swapaxes(vs, 0, 1)
    kq, ksc, vq, vsc = quantize_kv(k_contig, v_contig, "int8")
    want = flash_decode(
        q, kq, vq, k_scale=ksc, v_scale=vsc,
        kv_length=jnp.asarray(lens, jnp.int32), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_paged_prefill_append():
    """append_prefill writes a whole segment; decode sees the same cache as
    per-token appends."""
    key = jax.random.PRNGKey(7)
    L, B, Hk, D = 1, 2, 2, 32
    page, npages, maxp = 8, 16, 4
    T = 16
    ks = jax.random.normal(key, (B, T, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(8), (B, T, Hk, D))

    pool_a = PagedKVPool.create(L, npages, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool_a = pool_a.assign_pages(0, [1, 2]).assign_pages(1, [3, 4])
    for b in range(B):
        pool_a = pool_a.append_prefill(0, b, ks[b], vs[b], 0)
    pool_a = pool_a.set_lengths([T, T])

    pool_b = PagedKVPool.create(L, npages, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool_b = pool_b.assign_pages(0, [1, 2]).assign_pages(1, [3, 4])
    for t in range(T):
        pool_b = pool_b.append_token(0, ks[:, t], vs[:, t])
        pool_b = pool_b.advance(1)

    np.testing.assert_array_equal(
        np.asarray(pool_a.k_pages), np.asarray(pool_b.k_pages)
    )
    np.testing.assert_array_equal(
        np.asarray(pool_a.v_pages), np.asarray(pool_b.v_pages)
    )


def test_engine_chunked_prefill_matches_greedy(tiny):
    """Chunked prefill (with decode interleave between chunks) produces the
    same tokens as whole-prompt prefill (round-1 Weak #8: head-of-line
    blocking)."""
    cfg, params = tiny
    prompt_long = list(range(1, 21))  # 20 tokens, chunks of 8
    prompt_short = [5, 6, 7]
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
        prefill_chunk_size=8,
    )
    r_short = eng.submit(prompt_short, max_tokens=6)
    r_long = eng.submit(prompt_long, max_tokens=4)
    eng.run()
    assert r_short.done and r_long.done
    w_long = gpt2.greedy_decode(
        params, jnp.asarray([prompt_long]), cfg, steps=4, interpret=True
    )
    w_short = gpt2.greedy_decode(
        params, jnp.asarray([prompt_short]), cfg, steps=6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(r_long.generated), np.asarray(w_long[0]))
    np.testing.assert_array_equal(np.asarray(r_short.generated), np.asarray(w_short[0]))
    # metrics were actually recorded
    snap = eng.metrics.snapshot()
    assert snap["decode_tokens_per_s"] > 0 and snap["completed_requests"] == 2


def test_engine_metrics_wired(tiny):
    cfg, params = tiny
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    eng.submit([1, 2, 3], max_tokens=5)
    eng.run()
    snap = eng.metrics.snapshot()
    assert eng.metrics.prefill_tokens == 3
    assert eng.metrics.decode_tokens >= 4
    assert snap["completed_requests"] == 1


def test_paged_engine_end_to_end(tiny):
    """PagedInferenceEngine (native allocator + scalar-prefetch kernel)
    matches greedy decode, and pages cycle through admission/eviction:
    more requests than the pool can hold at once."""
    from flash_attn_tpu.engine.engine import PagedInferenceEngine

    cfg, params = tiny
    eng = PagedInferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, page_size=8,
        num_pages=2 * 8 + 1,  # exactly two sequences' worth -> forces reuse
        cache_dtype=jnp.dtype(cfg.dtype),
    )
    reqs = [eng.submit([i + 1, i + 2, i + 3], max_tokens=3) for i in range(4)]
    free0 = eng.alloc.free_count
    eng.run()
    assert all(r.done for r in reqs)
    # all pages returned to the free list after completion
    assert eng.alloc.free_count == 2 * 8
    for r in reqs:
        w = gpt2.greedy_decode(
            params, jnp.asarray([r.prompt]), cfg, steps=3, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(r.generated), np.asarray(w[0]))


def test_paged_engine_admission_deferred(tiny):
    """A request whose page demand exceeds the free pool waits until a
    completion releases pages (native-allocator-gated admission)."""
    from flash_attn_tpu.engine.engine import PagedInferenceEngine

    cfg, params = tiny
    eng = PagedInferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=32, page_size=8,
        num_pages=1 * 4 + 1,  # one sequence's worth only
        cache_dtype=jnp.dtype(cfg.dtype),
    )
    r1 = eng.submit(list(range(1, 11)), max_tokens=22)  # 32 tokens = 4 pages
    r2 = eng.submit(list(range(4, 14)), max_tokens=22)
    # first admit round: only r1 fits
    admitted = eng.sched.admit(eng._can_admit)
    assert [r.uid for r in admitted] == [r1.uid]
    for req in admitted:
        eng._admit_pages(req)
        eng._do_prefill(req)
    assert r2.slot is None  # deferred
    eng.run()
    assert r1.done and r2.done


def test_engine_packed_prefill_matches_greedy(tiny):
    """Two prompts admitted together go through ONE packed varlen prefill
    (segment ids + per-sequence positions) and still match greedy."""
    cfg, params = tiny
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    p1, p2 = [1, 2, 3, 4, 5], [9, 8, 7]
    r1 = eng.submit(p1, max_tokens=4)
    r2 = eng.submit(p2, max_tokens=5)
    eng.run()
    assert r1.done and r2.done
    w1 = gpt2.greedy_decode(params, jnp.asarray([p1]), cfg, steps=4, interpret=True)
    w2 = gpt2.greedy_decode(params, jnp.asarray([p2]), cfg, steps=5, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.generated), np.asarray(w1[0]))
    np.testing.assert_array_equal(np.asarray(r2.generated), np.asarray(w2[0]))
    # it actually took the packed path
    assert hasattr(eng, "_packed_jit")


def test_engine_speculative_decode_matches_greedy():
    """Speculative (ngram-draft + decode_multi verify) greedy output is
    token-exact vs plain greedy decode, and a repetitive prompt yields
    multi-token verify steps (acceptance > 0)."""
    from flash_attn_tpu.engine.engine import SpecConfig
    from flash_attn_tpu.models import llama

    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    # repetitive prompt so n-gram lookup has something to exploit
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

    outs = {}
    for spec in (None, SpecConfig(num_draft=3, ngram=2)):
        eng = InferenceEngine(
            params, llama.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, cache_dtype=jnp.float32, spec=spec,
        )
        r1 = eng.submit(prompt, max_tokens=8)
        r2 = eng.submit([9, 10, 11], max_tokens=6)
        eng.run()
        assert r1.done and r2.done
        outs["spec" if spec else "plain"] = (
            list(r1.generated), list(r2.generated), eng.metrics,
        )

    assert outs["spec"][0] == outs["plain"][0]
    assert outs["spec"][1] == outs["plain"][1]
    m = outs["spec"][2]
    assert m.spec_steps > 0
    # every verify step emits at least the correction token
    assert m.spec_emitted >= m.spec_steps


def test_engine_draft_model_spec_matches_greedy():
    """Draft-MODEL speculative decoding: greedy output is token-exact vs
    plain greedy decode for (a) a self-draft (draft == target: near-full
    acceptance) and (b) an unrelated random draft (acceptance may be low
    but exactness must hold — a bad draft can only cost speed)."""
    from flash_attn_tpu.engine.engine import SpecConfig
    from flash_attn_tpu.models import llama

    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    adapter = llama.make_adapter(cfg, interpret=True)
    # a smaller draft over the same vocab
    import dataclasses
    dcfg = dataclasses.replace(
        cfg, hidden=64, intermediate=128, num_layers=1, num_heads=2,
        num_kv_heads=1,
    )
    draft_params = llama.init_params(dcfg, jax.random.PRNGKey(99))
    draft_adapter = llama.make_adapter(dcfg, interpret=True)
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

    def run(spec):
        eng = InferenceEngine(
            params, adapter, max_batch=2, capacity=64,
            cache_dtype=jnp.float32, spec=spec,
        )
        r1 = eng.submit(prompt, max_tokens=8)
        r2 = eng.submit([9, 10, 11], max_tokens=6)
        eng.run()
        assert r1.done and r2.done
        return list(r1.generated), list(r2.generated), eng.metrics

    plain = run(None)
    self_draft = run(SpecConfig(num_draft=3, draft_params=params,
                                draft_adapter=adapter))
    small_draft = run(SpecConfig(num_draft=3, draft_params=draft_params,
                                 draft_adapter=draft_adapter))

    for got in (self_draft, small_draft):
        assert got[0] == plain[0]
        assert got[1] == plain[1]
    # the self-draft proposes exactly the target's greedy tokens: every
    # verify step must accept all drafts + the correction token
    m = self_draft[2]
    assert m.spec_steps > 0
    assert m.spec_emitted == m.spec_steps * (3 + 1)
    assert small_draft[2].spec_steps > 0


def test_engine_draft_spec_survives_headroom_fallback():
    """When a slot nears KV capacity, spec falls back to plain decode for
    the round; the draft cache must follow (same appends) so that when
    the tight slot completes and speculation RESUMES for the rest, the
    draft still proposes from valid context.  With a self-draft, resumed
    verify rounds must keep FULL acceptance — a desynced draft cache
    passes the exactness check (verify guarantees it) but collapses
    acceptance, which is what this asserts against."""
    from flash_attn_tpu.engine.engine import SpecConfig
    from flash_attn_tpu.models import llama

    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    adapter = llama.make_adapter(cfg, interpret=True)
    K = 3
    # slot0: 58-token prompt in a 64-capacity cache (capacity must be a
    # multiple of the 32-token append block) — forces plain-decode
    # fallback (needs K+1=4 headroom) partway through its 6 tokens;
    # slot1 keeps plenty of headroom and speculates again after slot0
    # completes
    p0 = [(i % 11) + 1 for i in range(58)]
    p1 = [9, 10, 11, 12, 13, 14]

    def run(spec):
        eng = InferenceEngine(
            params, adapter, max_batch=2, capacity=64,
            cache_dtype=jnp.float32, spec=spec,
        )
        r0 = eng.submit(p0, max_tokens=6)
        r1 = eng.submit(p1, max_tokens=24)
        eng.run()
        assert r0.done and r1.done
        return list(r0.generated), list(r1.generated), eng.metrics

    plain = run(None)
    spec = run(SpecConfig(num_draft=K, draft_params=params,
                          draft_adapter=adapter))
    assert spec[0] == plain[0]
    assert spec[1] == plain[1]
    m = spec[2]
    assert m.spec_steps > 0
    # self-draft: every verify round (including post-fallback resumed
    # ones) must accept all K drafts + the correction token
    assert m.spec_emitted == m.spec_steps * (K + 1), (
        m.spec_emitted, m.spec_steps,
    )


def test_engine_sharded_kv_matches_unsharded():
    """Sequence-sharded KV engine (BASELINE configs 3-4 glue): cache
    capacity axis sharded over a 4-device mesh, decode via per-shard
    flash_decode + one-psum LSE merge — token-exact vs the single-device
    engine."""
    from jax.sharding import Mesh
    from flash_attn_tpu.models import llama

    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]

    def run(mesh):
        eng = InferenceEngine(
            params,
            llama.make_adapter(cfg, interpret=True, mesh=mesh),
            max_batch=2, capacity=64, cache_dtype=jnp.float32, mesh=mesh,
        )
        reqs = [eng.submit(p, max_tokens=6) for p in prompts]
        eng.run()
        assert all(r.done for r in reqs)
        return [list(r.generated) for r in reqs]

    plain = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    sharded = run(mesh)
    assert sharded == plain


def test_paged_engine_prefix_cache():
    """Automatic prefix caching (engine/prefix_cache.py): a second request
    sharing a page-aligned prompt prefix reuses the donated pages (cache
    hit, suffix-only prefill) and generates the same tokens as the engine
    with prefix caching off."""
    from flash_attn_tpu.engine.engine import PagedInferenceEngine
    from flash_attn_tpu.models import llama as ll

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    shared = list(range(1, 17))  # 16 tokens = 2 full pages of 8
    p1 = shared + [21, 22, 23, 24]
    p2 = shared + [31, 32]

    def run(prefix_cache):
        eng = PagedInferenceEngine(
            params, ll.make_adapter(cfg, interpret=True),
            max_batch=1, capacity=64, page_size=8,
            cache_dtype=jnp.dtype(cfg.dtype), prefix_cache=prefix_cache,
        )
        r1 = eng.submit(p1, max_tokens=3)
        eng.run()
        r2 = eng.submit(p2, max_tokens=3)
        eng.run()
        assert r1.done and r2.done
        return eng, r1.generated, r2.generated

    eng_off, base1, base2 = run(False)
    eng_on, got1, got2 = run(True)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(base1))
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(base2))
    # r2 hit the cache (r1 donated its 2 full prompt pages)
    assert eng_on.prefix.hits == 1 and eng_on.prefix.misses == 1
    assert eng_on.prefix.resident_pages >= 2
    # donated pages stay resident (owned by the cache slot); everything a
    # request owned privately went back to the free list
    total = eng_on.pool.num_pages - 1
    assert eng_on.alloc.free_count == total - eng_on.prefix.resident_pages
    # all cache entries are unreferenced after completion -> evictable
    freed = eng_on.prefix.evict(100, eng_on.alloc)
    assert freed == eng_on.alloc.free_count - (total - freed - eng_on.prefix.resident_pages)
    assert eng_on.alloc.free_count == total


def test_prefix_cache_eviction_under_pressure():
    """Admission that cannot be satisfied evicts unreferenced cache entries
    (LRU) instead of deferring forever."""
    from flash_attn_tpu.engine.engine import PagedInferenceEngine
    from flash_attn_tpu.models import llama as ll

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    eng = PagedInferenceEngine(
        params, ll.make_adapter(cfg, interpret=True),
        max_batch=1, capacity=32, page_size=8,
        num_pages=5,  # 4 usable pages
        cache_dtype=jnp.dtype(cfg.dtype), prefix_cache=True,
    )
    r1 = eng.submit(list(range(1, 18)), max_tokens=3)  # 17+3 -> 3 pages
    eng.run()
    assert r1.done
    assert eng.prefix.resident_pages == 2  # donated full pages stay
    # a DIFFERENT prompt needing all 4 pages forces eviction of both
    r2 = eng.submit(list(range(40, 65)), max_tokens=6)  # 25+6 -> 4 pages
    eng.run()
    assert r2.done
    assert eng.prefix.hits == 0 and eng.prefix.misses == 2


def test_paged_decode_clamped_matches_online():
    """Paged kernel softmax_mode='clamped' == online (out + lse), incl. a
    partially-filled last page and an empty sequence."""
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode

    key = jax.random.PRNGKey(7)
    L, B, Hk, D = 1, 3, 2, 32
    page, npages, maxp = 8, 16, 4
    pool = PagedKVPool.create(L, npages, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool = (pool.assign_pages(0, [1, 2, 3, 4])
                .assign_pages(1, [5, 6, 7, 8])
                .assign_pages(2, [9, 10, 11, 12]))
    T = 19
    ks = jax.random.normal(key, (T, B, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(8), (T, B, Hk, D))
    for t in range(T):
        pool = pool.append_token(0, ks[t], vs[t]).advance(1)
    pool = pool.set_lengths([19, 11, 0])

    q = jax.random.normal(jax.random.PRNGKey(9), (B, 4, D))
    args = (q, pool.k_pages[0], pool.v_pages[0], pool.block_table, pool.length)
    want, want_lse = paged_flash_decode(
        *args, interpret=True, return_lse=True
    )
    got, lse = paged_flash_decode(
        *args, interpret=True, return_lse=True, softmax_mode="clamped"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(lse[:2]), np.asarray(want_lse[:2]),
                               atol=3e-4, rtol=3e-4)
    assert np.all(np.asarray(lse[2]) <= -1e29)  # empty seq -> invalid rows


def test_paged_chunk_matches_contiguous_chunk():
    """paged_flash_decode_chunk == flash_decode_chunk over the same cache
    content (the paged suffix-prefill/verify primitive), incl. quantized
    pages and clamped mode."""
    from flash_attn_tpu.ops.decode import flash_decode_chunk
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode_chunk

    key = jax.random.PRNGKey(21)
    L, B, Hk, H, D = 1, 2, 2, 4, 32
    page, npages, maxp = 8, 12, 4
    T = 4  # chunk
    for mode in ("none", "int8"):
        pool = PagedKVPool.create(L, npages, page, B, maxp, Hk, D,
                                  dtype=jnp.float32, mode=mode)
        pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])
        S = 22  # includes the chunk's 4 tokens; seq1 shorter
        ks = jax.random.normal(key, (S, B, Hk, D))
        vs = jax.random.normal(jax.random.PRNGKey(22), (S, B, Hk, D))
        for t in range(S):
            pool = pool.append_token(0, ks[t], vs[t]).advance(1)
        lens = jnp.asarray([22, 13], jnp.int32)
        pool = pool.set_lengths(lens)

        q = jax.random.normal(jax.random.PRNGKey(23), (B, T, H, D))
        got = paged_flash_decode_chunk(
            q, pool.k_pages[0], pool.v_pages[0], pool.block_table, lens,
            k_scale=None if pool.k_scale is None else pool.k_scale[0],
            v_scale=None if pool.v_scale is None else pool.v_scale[0],
            interpret=True,
        )
        gotc = paged_flash_decode_chunk(
            q, pool.k_pages[0], pool.v_pages[0], pool.block_table, lens,
            k_scale=None if pool.k_scale is None else pool.k_scale[0],
            v_scale=None if pool.v_scale is None else pool.v_scale[0],
            interpret=True, softmax_mode="clamped",
        )
        # contiguous reference over the same (quantized) cache content
        k_contig = jnp.swapaxes(ks, 0, 1)  # [B, S, Hk, D] float source
        v_contig = jnp.swapaxes(vs, 0, 1)
        from flash_attn_tpu.ops.quant import quantize_kv
        kq, ksc, vq, vsc = quantize_kv(k_contig, v_contig, mode)
        want = flash_decode_chunk(
            q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
            k_scale=None if ksc is None else jnp.swapaxes(ksc, 1, 2),
            v_scale=None if vsc is None else jnp.swapaxes(vsc, 1, 2),
            kv_length=lens, kv_layout="bhsd", block_k=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4, err_msg=mode)
        np.testing.assert_allclose(np.asarray(gotc), np.asarray(want),
                                   atol=3e-4, rtol=3e-4, err_msg=mode)


def test_paged_decode_sliding_window():
    """Paged kernel window=W == contiguous flash_decode window=W."""
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode

    key = jax.random.PRNGKey(31)
    L, B, Hk, H, D = 1, 2, 2, 4, 32
    page, npages, maxp = 8, 12, 4
    pool = PagedKVPool.create(L, npages, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])
    S = 26
    ks = jax.random.normal(key, (S, B, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(32), (S, B, Hk, D))
    for t in range(S):
        pool = pool.append_token(0, ks[t], vs[t]).advance(1)
    lens = jnp.asarray([26, 15], jnp.int32)
    pool = pool.set_lengths(lens)
    q = jax.random.normal(jax.random.PRNGKey(33), (B, H, D))
    W = 10
    got = paged_flash_decode(
        q, pool.k_pages[0], pool.v_pages[0], pool.block_table, lens,
        interpret=True, window=W,
    )
    want = flash_decode(
        q, jnp.swapaxes(ks, 0, 1), jnp.swapaxes(vs, 0, 1), kv_length=lens,
        use_kernel=False, interpret=True, window=W,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)


def test_request_cancellation(tiny):
    """Cancel: a queued request never runs; an active request stops at the
    next step and frees its slot for waiting work."""
    cfg, params = tiny
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=1, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    r1 = eng.submit([1, 2, 3], max_tokens=50)
    r2 = eng.submit([4, 5, 6], max_tokens=50)  # waits (max_batch=1)
    r3 = eng.submit([7, 8, 9], max_tokens=3)
    assert eng.cancel(r2)  # queued -> done immediately, never admitted
    assert r2.done and r2.generated == []
    # admit + prefill r1, then cancel it mid-decode
    admitted = eng.sched.admit()
    assert [r.uid for r in admitted] == [r1.uid]
    eng._do_prefill(r1)
    eng._do_decode_step()
    assert eng.cancel(r1)
    eng.run()
    assert r1.done and len(r1.generated) < 50  # stopped early
    assert r3.done and len(r3.generated) == 3  # slot freed, r3 ran
    assert not eng.cancel(r1)  # idempotent on finished requests


def test_paged_pool_fp8_permuted_scales():
    """fp8 pools store per-position scale lanes in the packed-pair decode's
    page order (evens-then-odds, engine/paged.PagedKVPool.scales_permuted):
    appends permute the write lane, gather readers unpermute, and
    paged_flash_decode reconciles the layout with whichever kernel it
    selects — so the interpret-mode result still matches the contiguous
    fp8 decode oracle."""
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    key = jax.random.PRNGKey(14)
    L, B, Hk, D = 1, 2, 2, 32
    page, npages, maxp = 8, 16, 4
    pool = PagedKVPool.create(
        L, npages, page, B, maxp, Hk, D, dtype=jnp.float32, mode="fp8"
    )
    assert pool.scales_permuted
    # scatter-to-lanes then gather-by-idx roundtrips, and the stored order
    # matches ops.decode's packed row order (_permute_scale_lanes)
    lanes = np.asarray(pool._scale_lane(jnp.arange(page)))
    idx = np.asarray(pool._scale_unperm_idx())
    assert sorted(lanes.tolist()) == list(range(page))
    nat = np.arange(100, 100 + page)
    stored = np.empty_like(nat)
    stored[lanes] = nat  # what appends produce
    np.testing.assert_array_equal(stored[idx], nat)  # what readers recover
    from flash_attn_tpu.ops.decode import _permute_scale_lanes

    np.testing.assert_array_equal(
        stored, np.asarray(_permute_scale_lanes(jnp.asarray(nat), page))
    )

    pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])
    lens = [20, 13]
    T = max(lens)
    ks = jax.random.normal(key, (T, B, Hk, D))
    vs = jax.random.normal(jax.random.PRNGKey(15), (T, B, Hk, D))
    for t in range(T):
        pool = pool.append_token(0, ks[t], vs[t])
        pool = pool.advance(1)
    pool = pool.set_lengths(lens)

    # gather_layer unpermutes: dequantized cache == quantize->dequantize
    k_contig = jnp.swapaxes(ks, 0, 1)  # [B, T, Hk, D]
    v_contig = jnp.swapaxes(vs, 0, 1)
    kq, ksc, vq, vsc = quantize_kv(k_contig, v_contig, "fp8")
    gk, gv, gks, gvs = pool.gather_layer(0)
    deq_got = np.asarray(gk[:, :T].astype(jnp.float32) * gks[:, :T])
    deq_want = np.asarray(kq.astype(jnp.float32) * ksc)
    np.testing.assert_allclose(deq_got, deq_want, atol=1e-6)

    # prefill append lands scales on the same permuted lanes as per-token
    pool_b = PagedKVPool.create(
        L, npages, page, B, maxp, Hk, D, dtype=jnp.float32, mode="fp8"
    )
    pool_b = pool_b.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])
    for b in range(B):
        pool_b = pool_b.append_prefill(0, b, ks[:, b], vs[:, b], 0)
    np.testing.assert_array_equal(
        np.asarray(pool.k_scale), np.asarray(pool_b.k_scale)
    )

    # decode through the paged kernel == contiguous fp8 decode
    q = jax.random.normal(jax.random.PRNGKey(16), (B, 4, D))
    got = paged_decode_attention(pool, 0, q, interpret=True)
    want = flash_decode(
        q, kq, vq, k_scale=ksc, v_scale=vsc,
        kv_length=jnp.asarray(lens, jnp.int32), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_engine_decode_burst_matches_greedy(tiny):
    """decode_burst > 1 (multi-step scheduling: several decode steps per
    dispatch) emits exactly the same greedy tokens as burst=1, including
    EOS mid-burst and heterogeneous max_tokens."""
    cfg, params = tiny
    prompts = [list(range(1, 9)), [3, 1, 4, 1, 5]]
    outs = []
    for burst in (1, 4):
        eng = InferenceEngine(
            params, gpt2.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
            decode_burst=burst,
        )
        reqs = [
            eng.submit(prompts[0], max_tokens=10),
            eng.submit(prompts[1], max_tokens=7),
        ]
        eng.run()
        assert all(r.done for r in reqs)
        outs.append([list(r.generated) for r in reqs])
    assert outs[0] == outs[1]


def test_paged_engine_decode_burst_matches(tiny):
    """PagedInferenceEngine with decode_burst emits the same greedy tokens
    as burst=1 (pages for prompt+max_tokens are admission-reserved, so a
    budget-bounded burst can't overrun them)."""
    from flash_attn_tpu.engine.engine import PagedInferenceEngine

    cfg, params = tiny
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]
    outs = []
    for burst in (1, 3):
        eng = PagedInferenceEngine(
            params, gpt2.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, page_size=16,
            cache_dtype=jnp.dtype(cfg.dtype), decode_burst=burst,
        )
        reqs = [
            eng.submit(prompts[0], max_tokens=8),
            eng.submit(prompts[1], max_tokens=5),
        ]
        eng.run()
        assert all(r.done for r in reqs)
        outs.append([list(r.generated) for r in reqs])
    assert outs[0] == outs[1]


def test_engine_burst_pipeline_waves(tiny):
    """Pipelined bursts (speculative in-flight dispatch) across several
    submission waves: slot reuse after completion must not leak tokens or
    KV between requests (the in-flight snapshot guard + length masking),
    and every wave's greedy tokens must match the burst=1 engine."""
    cfg, params = tiny
    waves = [
        [list(range(1, 9)), [3, 1, 4, 1, 5]],
        [[9, 8, 7], list(range(2, 12))],
        [[5, 5, 5, 5]],
    ]
    outs = []
    for burst in (1, 4):
        eng = InferenceEngine(
            params, gpt2.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
            decode_burst=burst,
        )
        got = []
        for wave in waves:
            reqs = [eng.submit(p, max_tokens=9) for p in wave]
            eng.run()
            assert all(r.done for r in reqs)
            got.append([list(r.generated) for r in reqs])
        outs.append(got)
    assert outs[0] == outs[1]


def test_paged_engine_burst_pipeline_waves(tiny):
    from flash_attn_tpu.engine.engine import PagedInferenceEngine

    cfg, params = tiny
    waves = [
        [[1, 2, 3, 4, 5], [7, 8, 9]],
        [[2, 4, 6], [1, 3, 5, 7, 9, 11]],
    ]
    outs = []
    for burst in (1, 3):
        eng = PagedInferenceEngine(
            params, gpt2.make_adapter(cfg, interpret=True),
            max_batch=2, capacity=64, page_size=16,
            cache_dtype=jnp.dtype(cfg.dtype), decode_burst=burst,
        )
        got = []
        for wave in waves:
            reqs = [eng.submit(p, max_tokens=8) for p in wave]
            eng.run()
            assert all(r.done for r in reqs)
            got.append([list(r.generated) for r in reqs])
        outs.append(got)
    assert outs[0] == outs[1]
