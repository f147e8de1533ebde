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


# ---------------------------------------------------------------------------
# Striped (flops-balanced) causal ring


def test_striped_ring_matches_single_device(mesh4):
    from flash_attn_tpu.parallel.ring import stripe_sequence, unstripe_sequence

    q, k, v = qkv(jax.random.PRNGKey(20), 1, 256, 4, 64)
    ring_fn = make_ring_attention(
        mesh4, causal=True, layout="striped", interpret=True
    )
    got = unstripe_sequence(
        ring_fn(
            stripe_sequence(q, 4), stripe_sequence(k, 4), stripe_sequence(v, 4)
        ),
        4,
    )
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_striped_ring_backward(mesh4):
    from flash_attn_tpu.ops.reference import mha_reference_vjp
    from flash_attn_tpu.parallel.ring import stripe_sequence, unstripe_sequence

    q, k, v = qkv(jax.random.PRNGKey(21), 1, 256, 4, 64)
    dout = jax.random.normal(jax.random.PRNGKey(22), q.shape)
    ring_fn = make_ring_attention(
        mesh4, causal=True, layout="striped", interpret=True
    )

    def f(q_, k_, v_):
        out = ring_fn(
            stripe_sequence(q_, 4), stripe_sequence(k_, 4),
            stripe_sequence(v_, 4),
        )
        return jnp.sum(unstripe_sequence(out, 4) * dout)

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, causal=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_striped_ring_flops_balance():
    """Combinatorial proof of the layout's properties, derived from
    stripe_sequence itself: (a) every (device, kv-source) block of the
    striped causal mask is exactly triangular (j <= i for sources <= d,
    j <= i-1 after — the two kernel branches), so per-step work is equal
    across devices at every step; (b) the contiguous layout's per-device
    totals are ~(n+1)/2 apart, the imbalance being fixed."""
    from flash_attn_tpu.parallel.ring import stripe_sequence

    n, S = 4, 64
    s_loc = S // n
    perm = np.asarray(stripe_sequence(jnp.arange(S)[None], n, axis=1))[0]
    causal = np.tril(np.ones((S, S), bool))
    m_str = causal[np.ix_(perm, perm)]
    tri = np.tril(np.ones((s_loc, s_loc), bool))
    tri_strict = np.tril(np.ones((s_loc, s_loc), bool), k=-1)
    per_step = np.zeros((n, n), int)  # [device, step]
    for d in range(n):
        for t in range(n):
            s = (d - t) % n
            blk = m_str[
                d * s_loc : (d + 1) * s_loc, s * s_loc : (s + 1) * s_loc
            ]
            want = tri if s <= d else tri_strict
            assert (blk == want).all(), (d, s)
            per_step[d, t] = blk.sum()
    # striped: per-STEP spread across devices is at most one diagonal
    assert (per_step.max(0) - per_step.min(0) <= s_loc).all()
    # contiguous: total-work ratio between heaviest and lightest device = n
    contig = np.array(
        [
            sum(
                causal[
                    d * s_loc : (d + 1) * s_loc, s * s_loc : (s + 1) * s_loc
                ].sum()
                for s in range(n)
            )
            for d in range(n)
        ]
    )
    assert contig.max() / contig.min() > (n + 1) / 2 - 0.1
    # striped per-device totals are equal to within one diagonal per step
    totals = per_step.sum(1)
    assert totals.max() - totals.min() <= n * s_loc


# ---------------------------------------------------------------------------
# Distributed feature parity (flash_attn.h:26,33-36 on ring/ulysses)


def test_ring_bias_softcap(mesh4):
    b, s, h, d = 1, 256, 4, 64
    q, k, v = qkv(jax.random.PRNGKey(23), b, s, h, d)
    bias = jax.random.normal(jax.random.PRNGKey(24), (b, h, s, s)) * 2
    dout = jax.random.normal(jax.random.PRNGKey(25), q.shape)
    ring_fn = make_ring_attention(
        mesh4, causal=True, has_bias=True, logit_softcap=30.0, interpret=True
    )
    got = ring_fn(q, k, v, bias)
    want = mha_reference(q, k, v, causal=True, mask=bias, logit_softcap=30.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )

    def f_ring(q_, k_, v_, b_):
        return jnp.sum(ring_fn(q_, k_, v_, b_) * dout)

    def f_ref(q_, k_, v_, b_):
        o = mha_reference(q_, k_, v_, causal=True, mask=b_, logit_softcap=30.0)
        return jnp.sum(o * dout)

    got_g = jax.grad(f_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want_g = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w, name in zip(got_g, want_g, "q k v bias".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-3, rtol=2e-3, err_msg=name
        )


def test_ring_window_causal(mesh4):
    q, k, v = qkv(jax.random.PRNGKey(26), 1, 256, 4, 64)
    dout = jax.random.normal(jax.random.PRNGKey(27), q.shape)
    window = (96, 0)
    ring_fn = make_ring_attention(
        mesh4, causal=True, window=window, interpret=True
    )
    got = ring_fn(q, k, v)
    want = mha_reference(q, k, v, causal=True, window=window)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )
    from flash_attn_tpu.ops.reference import mha_reference_vjp

    def f(q_, k_, v_):
        return jnp.sum(ring_fn(q_, k_, v_) * dout)

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(
        q, k, v, dout, causal=True, window=window
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_ring_dropout_deterministic_and_plumbed(mesh4):
    """Ring dropout: (a) bit-deterministic across calls (counter RNG,
    flash_attn.h:33-34); (b) matches a single-process simulation of the
    exact ring algebra (same per-(q-shard, kv-shard) seeds, same LSE
    merges) — validating the shard_map plumbing and seed offsets; (c) the
    custom backward is deterministic and differs from the no-dropout grad
    (the mask reached the recompute)."""
    from flash_attn_tpu.ops.flash_fwd import flash_fwd
    from flash_attn_tpu.ops.lse import lse_merge2
    from flash_attn_tpu.parallel.ring import _step_seed

    b, s, h, d, n = 1, 256, 2, 32, 4
    rate, seed = 0.3, 7
    q, k, v = qkv(jax.random.PRNGKey(28), b, s, h, d)
    ring_fn = make_ring_attention(
        mesh4, causal=True, dropout_rate=rate, interpret=True
    )
    body = lambda q_, k_, v_: ring_fn(q_, k_, v_)
    # NB: dropout_seed is bound at make time via the body default (0); use
    # the shard-local API for an explicit seed instead.
    from flash_attn_tpu.parallel.ring import ring_attention  # noqa: F401

    got1 = ring_fn(q, k, v)
    got2 = ring_fn(q, k, v)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))

    # single-process simulation of the ring algebra with identical seeds
    s_loc = s // n
    outs = []
    for dev in range(n):
        qd = q[:, dev * s_loc : (dev + 1) * s_loc]
        acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
        lse = jnp.full((b, h, s_loc), float("-inf"), jnp.float32)
        for t in range(n):
            src = (dev - t) % n
            if src > dev:
                continue
            kc = k[:, src * s_loc : (src + 1) * s_loc]
            vc = v[:, src * s_loc : (src + 1) * s_loc]
            o_i, l_i = flash_fwd(
                qd, kc, vc, causal=(src == dev), dropout_rate=rate,
                dropout_seed=_step_seed(
                    jnp.int32(0), jnp.int32(dev), jnp.int32(src), n
                ),
                interpret=True,
            )
            acc, lse = lse_merge2(acc, lse, jnp.swapaxes(o_i, 1, 2), l_i)
        outs.append(jnp.swapaxes(acc, 1, 2))
    sim = jnp.concatenate(outs, axis=1).astype(q.dtype)
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(sim), atol=2e-4, rtol=2e-4
    )

    dout = jax.random.normal(jax.random.PRNGKey(29), q.shape)

    def f(q_):
        return jnp.sum(ring_fn(q_, k, v) * dout)

    g1 = jax.grad(f)(q)
    g2 = jax.grad(f)(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    nodrop_fn = make_ring_attention(mesh4, causal=True, interpret=True)
    g0 = jax.grad(lambda q_: jnp.sum(nodrop_fn(q_, k, v) * dout))(q)
    assert not np.allclose(np.asarray(g1), np.asarray(g0), atol=1e-3)
    del seed, body


def test_ulysses_features(mesh4):
    b, s, h, d = 1, 256, 8, 64
    q, k, v = qkv(jax.random.PRNGKey(30), b, s, h, d)
    bias = jax.random.normal(jax.random.PRNGKey(31), (b, h, s, s)) * 2
    dout = jax.random.normal(jax.random.PRNGKey(32), q.shape)
    fn = make_ulysses_attention(
        mesh4, causal=True, has_bias=True, window=(128, 0),
        logit_softcap=50.0, interpret=True,
    )
    got = fn(q, k, v, bias)
    want = mha_reference(
        q, k, v, causal=True, mask=bias, window=(128, 0), logit_softcap=50.0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )

    def f_u(q_, k_, v_, b_):
        return jnp.sum(fn(q_, k_, v_, b_) * dout)

    def f_ref(q_, k_, v_, b_):
        o = mha_reference(
            q_, k_, v_, causal=True, mask=b_, window=(128, 0),
            logit_softcap=50.0,
        )
        return jnp.sum(o * dout)

    got_g = jax.grad(f_u, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want_g = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w, name in zip(got_g, want_g, "q k v bias".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-3, rtol=2e-3, err_msg=name
        )


def test_ulysses_dropout_deterministic(mesh4):
    q, k, v = qkv(jax.random.PRNGKey(33), 1, 256, 8, 64)
    fn = make_ulysses_attention(
        mesh4, causal=True, dropout_rate=0.25, interpret=True
    )
    o1, o2 = fn(q, k, v), fn(q, k, v)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    nodrop = make_ulysses_attention(mesh4, causal=True, interpret=True)
    assert not np.allclose(
        np.asarray(o1), np.asarray(nodrop(q, k, v)), atol=1e-3
    )


def test_rdma_ring_matches_single_device(mesh4):
    """Pallas RDMA ring (parallel/rdma_ring.py): per-step
    make_async_remote_copy of the KV shard to the right neighbor, issued
    under the step's compute — validated on the CPU interpreter's
    cross-device semantics (real-ICI perf is env-blocked, SURVEY.md §7c)."""
    from flash_attn_tpu.parallel.rdma_ring import make_rdma_ring_attention

    b, s, h, hk, d = 1, 256, 4, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(40), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(41), (b, s, hk, d))
    v = jax.random.normal(jax.random.PRNGKey(42), (b, s, hk, d))
    for causal in (False, True):
        fn = make_rdma_ring_attention(
            mesh4, causal=causal, block_q=64, interpret=True
        )
        got = fn(q, k, v)
        want = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4,
            err_msg=f"causal={causal}",
        )


def test_two_level_dcn_ring_train():
    """BASELINE configs 3-4 topology: a TWO-LEVEL mesh ("dcn", "sp") — data
    parallelism across the slow inter-slice axis, ring attention (with its
    reverse-ring backward) along the fast intra-slice axis.  In JAX the DCN
    boundary is just the outer mesh axis (SURVEY.md §5: DCN-crossing
    collectives are mesh-layout, not new code); this validates that the
    ring's fwd AND bwd compile and are exact when nested under a second
    sharded axis, i.e. the 2-host 128k-ring config is a sharding, not a
    port."""
    from jax.sharding import Mesh, NamedSharding

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dcn", "sp"))
    b, s, h, d = 2, 256, 4, 32
    q, k, v = qkv(jax.random.PRNGKey(50), b, s, h, d)
    spec = P("dcn", "sp", None, None)

    from flash_attn_tpu.parallel.ring import ring_attention

    fn = jax.shard_map(
        lambda q_, k_, v_: ring_attention(
            q_, k_, v_, axis_name="sp", causal=True, interpret=True
        ),
        mesh=mesh2, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    qs, ks, vs = (
        jax.device_put(x, NamedSharding(mesh2, spec)) for x in (q, k, v)
    )

    @jax.jit
    def loss_and_dq(q_, k_, v_):
        f = lambda a: jnp.sum(fn(a, k_, v_).astype(jnp.float32))
        return jax.value_and_grad(f)(q_)

    got_l, got_dq = loss_and_dq(qs, ks, vs)

    ref = lambda a: jnp.sum(
        mha_reference(a, k, v, causal=True).astype(jnp.float32)
    )
    want_l, want_dq = jax.value_and_grad(ref)(q)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_dq), np.asarray(want_dq), atol=2e-4, rtol=2e-4
    )
