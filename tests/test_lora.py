"""Multi-adapter LoRA serving: batched per-slot deltas vs the merged-weight
oracle (models/lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models import llama
from flash_attn_tpu.models.lora import (
    init_lora, lora_delta, merge_lora, stack_adapters,
)


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))

    def rand_lora(seed):
        lr = init_lora(params, 4, jax.random.PRNGKey(seed), alpha=8)
        # randomize B (init is zeros) so deltas are nonzero
        lr["blocks"] = jax.tree.map(
            lambda x: x
            if x.shape[-2] != 4  # A leaves keep their init
            else jax.random.normal(
                jax.random.PRNGKey(seed + 100), x.shape, x.dtype
            ) * 0.05,
            lr["blocks"],
        )
        return lr

    return cfg, params, rand_lora(1), rand_lora(2)


def test_single_lora_matches_merged(setup):
    cfg, params, lora, _ = setup
    merged = merge_lora(params, lora)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, cfg.vocab_size)
    pos = jnp.arange(8)[None]
    got, kvs_g = llama.prefill_with_kv(params, prompt, pos, cfg,
                                       interpret=True, lora=lora)
    want, kvs_w = llama.prefill_with_kv(merged, prompt, pos, cfg,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)

    cache = llama.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs_g):
        cache = cache.append(i, k, v)
    cache = cache.advance(8)
    tok = jnp.argmax(got[:, -1], -1)
    d_got, _ = llama.decode_step(params, tok, cfg, cache, interpret=True,
                                 lora=lora)
    cache_w = llama.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs_w):
        cache_w = cache_w.append(i, k, v)
    cache_w = cache_w.advance(8)
    d_want, _ = llama.decode_step(merged, tok, cfg, cache_w, interpret=True)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want),
                               atol=2e-3, rtol=2e-3)


def test_bank_per_slot_adapters_match_individual(setup):
    """A 2-slot batched decode with a stacked bank == each slot decoded
    under its own merged weights."""
    cfg, params, lora0, lora1 = setup
    bank = stack_adapters([lora0, lora1])
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, cfg.vocab_size)
    pos = jnp.arange(6)[None]

    # per-adapter prefill (bank + scalar id) into one 2-slot cache
    _, kvs0 = llama.prefill_with_kv(params, prompt, pos, cfg, interpret=True,
                                    lora=bank, lora_id=0)
    _, kvs1 = llama.prefill_with_kv(params, prompt, pos, cfg, interpret=True,
                                    lora=bank, lora_id=1)
    cache = llama.make_cache(cfg, 2, 32)
    for i, ((k0, v0), (k1, v1)) in enumerate(zip(kvs0, kvs1)):
        cache = cache.append(
            i, jnp.concatenate([k0, k1]), jnp.concatenate([v0, v1])
        )
    cache = cache.advance(6)

    tok = jnp.asarray([3, 7], jnp.int32)
    got, _ = llama.decode_step(params, tok, cfg, cache, interpret=True,
                               lora=bank, lora_ids=jnp.asarray([0, 1]))

    for slot, lora in ((0, lora0), (1, lora1)):
        merged = merge_lora(params, lora)
        _, kvs = llama.prefill_with_kv(merged, prompt, pos, cfg, interpret=True)
        c1 = llama.make_cache(cfg, 1, 32)
        for i, (k, v) in enumerate(kvs):
            c1 = c1.append(i, k, v)
        c1 = c1.advance(6)
        want, _ = llama.decode_step(merged, tok[slot:slot + 1], cfg, c1,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got[slot]), np.asarray(want[0]),
                                   atol=2e-3, rtol=2e-3)


def test_lora_delta_shapes_and_bank_errors(setup):
    _, params, lora0, lora1 = setup
    bank = stack_adapters([lora0, lora1])
    x = jnp.ones((2, 1, 128))
    ab = bank["blocks"][0]["wq"]
    out = lora_delta(x, ab, jnp.asarray([0, 1]), bank["scaling"])
    assert out.shape == (2, 1, ab[1].shape[-1])
    with pytest.raises(ValueError):
        lora_delta(x, ab, None, 1.0)
    import dataclasses  # noqa: F401

    bad = dict(lora1)
    bad["scaling"] = 99.0
    with pytest.raises(ValueError):
        stack_adapters([lora0, bad])


def test_engine_multi_adapter_serving(setup):
    """Two concurrent requests with different adapters through ONE engine
    (stacked bank, per-slot deltas) generate exactly what two
    merged-weight engines generate."""
    from flash_attn_tpu.engine.engine import InferenceEngine

    cfg, params, lora0, lora1 = setup
    bank = stack_adapters([lora0, lora1])
    adapter = llama.make_adapter(cfg, interpret=True)
    prompts = ([1, 2, 3, 4, 5], [9, 8, 7])

    eng = InferenceEngine(params, adapter, max_batch=2, capacity=64,
                          cache_dtype=jnp.dtype(cfg.dtype), lora_bank=bank)
    r0 = eng.submit(prompts[0], max_tokens=4, adapter=0)
    r1 = eng.submit(prompts[1], max_tokens=4, adapter=1)
    eng.run()
    assert r0.done and r1.done

    for lora, req, prompt in ((lora0, r0, prompts[0]), (lora1, r1, prompts[1])):
        merged = merge_lora(params, lora)
        ref = InferenceEngine(merged, adapter, max_batch=1, capacity=64,
                              cache_dtype=jnp.dtype(cfg.dtype))
        want = ref.submit(prompt, max_tokens=4)
        ref.run()
        np.testing.assert_array_equal(np.asarray(req.generated),
                                      np.asarray(want.generated))
