"""Distributed paths on the virtual 8-device CPU mesh (SURVEY.md §4.3):
ring attention has an exact algebraic oracle — ring-merged (out, lse) must
equal the single-device kernel's output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.ops.reference import mha_reference
from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
from flash_attn_tpu.parallel.ring import make_ring_attention
from flash_attn_tpu.parallel.ulysses import make_ulysses_attention


@pytest.fixture(scope="module")
def mesh4():
    cfg = MeshConfig(sp=4)
    return make_mesh(cfg)


def qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, s, h, d)) for k in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_single_device(mesh4, causal):
    q, k, v = qkv(jax.random.PRNGKey(0), 1, 256, 4, 64)
    ring_fn = make_ring_attention(mesh4, causal=causal, interpret=True)
    got = ring_fn(q, k, v)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_single_device(mesh4, causal):
    q, k, v = qkv(jax.random.PRNGKey(1), 1, 256, 8, 64)
    fn = make_ulysses_attention(mesh4, causal=causal, interpret=True)
    got = fn(q, k, v)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_tp_sharded_gpt2_forward(mesh4):
    """GPT-2 forward under pjit with Megatron shardings == unsharded."""
    from flash_attn_tpu.models import gpt2
    from flash_attn_tpu.parallel.tp import gpt2_param_specs, shard_params

    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(2))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    want = gpt2.forward(params, tokens, cfg, interpret=True)

    sharded = shard_params(params, mesh4, gpt2_param_specs("tp"))
    got = jax.jit(lambda p, t: gpt2.forward(p, t, cfg, interpret=True))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_sharded_decode_matches_single_device(mesh4):
    """KV sharded over 4 devices + LSE psum merge == single-device decode
    (BASELINE config 3 path)."""
    import numpy as onp

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.parallel.sharded_decode import make_sharded_decode

    B, S, H, Hk, D = 2, 512, 4, 2, 64
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (B, H, D))
    k = jax.random.normal(jax.random.PRNGKey(6), (B, S, Hk, D))
    v = jax.random.normal(jax.random.PRNGKey(7), (B, S, Hk, D))
    # ragged validity: per-shard lengths for global lengths [300, 512]
    glens = [300, 512]
    s_loc = S // 4
    lens = onp.zeros((4, B), onp.int32)
    for b, gl in enumerate(glens):
        for sh in range(4):
            lens[sh, b] = min(max(gl - sh * s_loc, 0), s_loc)

    fn = make_sharded_decode(mesh4, interpret=True)
    got = fn(q, k, v, jnp.asarray(lens))
    want = flash_decode(q, k, v, kv_length=jnp.asarray(glens), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_decode_return_lse_matches_merge():
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.lse import lse_merge2

    B, S, H, D = 1, 256, 2, 32
    q = jax.random.normal(jax.random.PRNGKey(8), (B, H, D))
    k = jax.random.normal(jax.random.PRNGKey(9), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(10), (B, S, H, D))
    o1, l1 = flash_decode(q, k[:, :128], v[:, :128], interpret=True, return_lse=True)
    o2, l2 = flash_decode(q, k[:, 128:], v[:, 128:], interpret=True, return_lse=True)
    merged, _ = lse_merge2(o1, l1, o2, l2)
    full = flash_decode(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_backward(mesh4, causal):
    """jax.grad through make_ring_attention == grad of the single-device
    oracle (round-1 Missing #4: ring was inference-only)."""
    from flash_attn_tpu.ops.reference import mha_reference_vjp

    q, k, v = qkv(jax.random.PRNGKey(11), 1, 256, 4, 64)
    dout = jax.random.normal(jax.random.PRNGKey(12), q.shape)
    ring_fn = make_ring_attention(mesh4, causal=causal, interpret=True)

    def f(q_, k_, v_):
        return jnp.sum(ring_fn(q_, k_, v_) * dout)

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, causal=causal)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_ring_attention_gqa(mesh4):
    """Ring attention with grouped KV heads (Hk < H), fwd and bwd."""
    from flash_attn_tpu.ops.reference import mha_reference_vjp

    key = jax.random.PRNGKey(13)
    b, s, h, hk, d = 1, 256, 8, 2, 64
    q = jax.random.normal(key, (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(14), (b, s, hk, d))
    v = jax.random.normal(jax.random.PRNGKey(15), (b, s, hk, d))
    dout = jax.random.normal(jax.random.PRNGKey(16), q.shape)
    ring_fn = make_ring_attention(mesh4, causal=True, interpret=True)

    got = ring_fn(q, k, v)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)

    def f(q_, k_, v_):
        return jnp.sum(ring_fn(q_, k_, v_) * dout)

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, causal=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_ulysses_gqa(mesh4):
    """Ulysses all-to-all path with grouped KV heads (Hk < H but Hk >= ring
    size so heads still shard)."""
    key = jax.random.PRNGKey(17)
    b, s, h, hk, d = 1, 256, 8, 4, 64
    q = jax.random.normal(key, (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(18), (b, s, hk, d))
    v = jax.random.normal(jax.random.PRNGKey(19), (b, s, hk, d))
    fn = make_ulysses_attention(mesh4, causal=True, interpret=True)
    got = fn(q, k, v)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_ulysses_mqa_fewer_kv_heads_than_devices(mesh4):
    """Ulysses with Hk < axis size (MQA-ish): KV heads replicate across the
    all-to-all; result matches the single-device oracle exactly, fwd + bwd."""
    b, s, h, hk, d = 1, 256, 8, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(60), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(61), (b, s, hk, d))
    v = jax.random.normal(jax.random.PRNGKey(62), (b, s, hk, d))
    fn = make_ulysses_attention(mesh4, causal=True, interpret=True)
    got = fn(q, k, v)
    want = mha_reference(
        q, jnp.repeat(k, h // hk, 2), jnp.repeat(v, h // hk, 2), causal=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    # differentiable (the a2a + replicate transpose under AD)
    g = jax.grad(lambda q_: jnp.sum(fn(q_, k, v)))(q)
    gw = jax.grad(lambda q_: jnp.sum(mha_reference(
        q_, jnp.repeat(k, h // hk, 2), jnp.repeat(v, h // hk, 2), causal=True
    )))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               atol=2e-4, rtol=2e-4)
