"""Pallas FA2 backward vs jax.grad of the jnp oracle (SURVEY.md §4.1), plus
determinism (same inputs twice -> bitwise-equal grads, SURVEY.md §5 race
obligation) and dropout fwd/bwd mask-replay consistency (flash_attn.h:96-97).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.flash_bwd import flash_bwd
from flash_attn_tpu.ops.flash_fwd import flash_fwd
from flash_attn_tpu.ops.reference import mha_reference, mha_reference_vjp


def make_qkv(key, batch, sq, sk, h, hk, d, dtype=jnp.float32):
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, sq, h, d), dtype=jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (batch, sk, hk, d), dtype=jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (batch, sk, hk, d), dtype=jnp.float32).astype(dtype)
    dout = jax.random.normal(kd, (batch, sq, h, d), dtype=jnp.float32).astype(dtype)
    return q, k, v, dout


def check_grads(q, k, v, dout, atol=5e-4, **kw):
    out, lse = flash_fwd(q, k, v, interpret=True, **kw)
    dq, dk, dv = flash_bwd(q, k, v, out, lse, dout, interpret=True, **kw)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, **_oracle_kw(kw))
    for got, want, name in [(dq, rdq, "dq"), (dk, rdk, "dk"), (dv, rdv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=atol, rtol=atol, err_msg=name,
        )


def _oracle_kw(kw):
    out = dict(kw)
    out.pop("config", None)
    if "bias" in out:
        out["mask"] = out.pop("bias")
    return out


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_dense(causal):
    q, k, v, dout = make_qkv(jax.random.PRNGKey(0), 2, 128, 128, 2, 2, 64)
    check_grads(q, k, v, dout, causal=causal)


def test_bwd_rect():
    q, k, v, dout = make_qkv(jax.random.PRNGKey(1), 1, 128, 384, 2, 2, 64)
    check_grads(q, k, v, dout, causal=True)
    q, k, v, dout = make_qkv(jax.random.PRNGKey(2), 1, 200, 120, 2, 2, 64)
    check_grads(q, k, v, dout, causal=False)


def test_bwd_gqa():
    q, k, v, dout = make_qkv(jax.random.PRNGKey(3), 1, 128, 128, 8, 2, 64)
    check_grads(q, k, v, dout, causal=True)


def test_bwd_bias():
    q, k, v, dout = make_qkv(jax.random.PRNGKey(4), 1, 128, 128, 2, 2, 64)
    bias = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 128, 128))
    check_grads(q, k, v, dout, bias=bias)


def test_bwd_segment_ids():
    q, k, v, dout = make_qkv(jax.random.PRNGKey(6), 1, 128, 128, 2, 2, 64)
    seg = jnp.concatenate(
        [jnp.full((1, 64), 1, jnp.int32), jnp.full((1, 64), 2, jnp.int32)], axis=1
    )
    check_grads(q, k, v, dout, q_segment_ids=seg, kv_segment_ids=seg)


def test_custom_vjp_matches_oracle_grad():
    """jax.grad through the public API vs jax.grad of the oracle."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(7), 1, 128, 128, 2, 2, 64)

    def f(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=True, interpret=True)
            * dout
        )

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, causal=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_bwd_deterministic():
    q, k, v, dout = make_qkv(jax.random.PRNGKey(8), 1, 256, 256, 2, 2, 64)
    out, lse = flash_fwd(q, k, v, causal=True, interpret=True)
    g1 = flash_bwd(q, k, v, out, lse, dout, causal=True, interpret=True)
    g2 = flash_bwd(q, k, v, out, lse, dout, causal=True, interpret=True)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_fwd_bwd_consistency():
    """Backward must replay the identical dropout mask from the same seed:
    flash grads with dropout == oracle grads with the kernel's own mask.

    We verify via finite differences on a single element: with a fixed seed
    the dropped network is a deterministic function, so (f(x+e)-f(x-e))/2e
    must match the analytic dq from the kernel pair.
    """
    q, k, v, dout = make_qkv(jax.random.PRNGKey(9), 1, 64, 64, 1, 1, 32)
    kw = dict(dropout_rate=0.3, dropout_seed=123, interpret=True)

    out, lse = flash_fwd(q, k, v, **kw)
    dq, dk, dv = flash_bwd(q, k, v, out, lse, dout, **kw)

    def loss(q_):
        o, _ = flash_fwd(q_, k, v, **kw)
        return float(jnp.sum(o * dout))

    eps = 1e-3
    idx = (0, 3, 0, 5)
    qp = q.at[idx].add(eps)
    qm = q.at[idx].add(-eps)
    fd = (loss(qp) - loss(qm)) / (2 * eps)
    assert abs(fd - float(dq[idx])) < 5e-2, (fd, float(dq[idx]))


def test_dropout_forward_statistics():
    q, k, v, _ = make_qkv(jax.random.PRNGKey(10), 1, 128, 128, 2, 2, 32)
    out_nd, _ = flash_fwd(q, k, v, interpret=True)
    out_d, _ = flash_fwd(q, k, v, dropout_rate=0.5, dropout_seed=7, interpret=True)
    # Dropout keeps expectation: means should be in the same ballpark, and
    # the dropped output must actually differ.
    assert not np.allclose(np.asarray(out_nd), np.asarray(out_d))
    assert abs(float(jnp.mean(out_d)) - float(jnp.mean(out_nd))) < 0.1
    # determinism: same seed -> bitwise equal
    out_d2, _ = flash_fwd(q, k, v, dropout_rate=0.5, dropout_seed=7, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_d2))
    # different seed -> different mask
    out_d3, _ = flash_fwd(q, k, v, dropout_rate=0.5, dropout_seed=8, interpret=True)
    assert not np.array_equal(np.asarray(out_d), np.asarray(out_d3))


def test_bwd_window():
    """Local-attention window in the Pallas backward (flash_attn.h windowed
    masking parity; VERDICT round-1 Missing #5)."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(11), 1, 128, 128, 2, 2, 64)
    check_grads(q, k, v, dout, window=(16, 0), causal=True)
    check_grads(q, k, v, dout, window=(32, 8))


def test_bwd_dbias():
    """Real dbias from the Pallas dkv pass (not zeros)."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(12), 1, 128, 128, 2, 2, 64)
    bias = jax.random.normal(jax.random.PRNGKey(13), (1, 2, 128, 128))
    out, lse = flash_fwd(q, k, v, bias=bias, interpret=True)
    dq, dk, dv, dbias = flash_bwd(
        q, k, v, out, lse, dout, bias=bias, want_dbias=True, interpret=True
    )

    def f(q_, k_, v_, b_):
        return jnp.sum(mha_reference(q_, k_, v_, mask=b_) * dout)

    rdq, rdk, rdv, rdbias = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rdbias),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                               atol=5e-4, rtol=5e-4)


def test_bwd_dbias_broadcast_shapes():
    """dbias reduces correctly onto broadcastable bias shapes."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(14), 2, 128, 128, 2, 2, 64)
    for shape in [(1, 1, 128, 128), (2, 1, 1, 128), (128, 128)]:
        bias = jax.random.normal(jax.random.PRNGKey(15), shape)
        out, lse = flash_fwd(q, k, v, bias=bias, interpret=True)
        *_, dbias = flash_bwd(
            q, k, v, out, lse, dout, bias=bias, want_dbias=True, interpret=True
        )

        def f(b_):
            return jnp.sum(mha_reference(q, k, v, mask=b_) * dout)

        rdbias = jax.grad(f)(bias)
        np.testing.assert_allclose(np.asarray(dbias), np.asarray(rdbias),
                                   atol=5e-4, rtol=5e-4, err_msg=str(shape))


def test_bwd_dbias_with_dropout():
    """bias+dropout gradients: finite-difference check on a bias element
    (round-1 Weak #3 returned silently-zero dbias here)."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(16), 1, 64, 64, 1, 1, 32)
    bias = jax.random.normal(jax.random.PRNGKey(17), (1, 1, 64, 64))
    kw = dict(dropout_rate=0.3, dropout_seed=99, interpret=True)
    out, lse = flash_fwd(q, k, v, bias=bias, **kw)
    *_, dbias = flash_bwd(
        q, k, v, out, lse, dout, bias=bias, want_dbias=True, **kw
    )

    def loss(b_):
        o, _ = flash_fwd(q, k, v, bias=b_, **kw)
        return float(jnp.sum(o * dout))

    eps = 1e-3
    idx = (0, 0, 7, 11)
    fd = (loss(bias.at[idx].add(eps)) - loss(bias.at[idx].add(-eps))) / (2 * eps)
    assert abs(fd - float(dbias[idx])) < 5e-2, (fd, float(dbias[idx]))


def test_dropout_replay_across_block_configs():
    """The dropout mask is keyed on absolute element coords, so fwd and bwd
    replay identically even with different block configs (round-1 Weak #4:
    block-index keying silently corrupted grads at seqlen >= 512)."""
    from flash_attn_tpu.ops.flash_fwd import FlashConfig

    q, k, v, dout = make_qkv(jax.random.PRNGKey(18), 1, 512, 512, 1, 1, 32)
    kw = dict(dropout_rate=0.3, dropout_seed=5, interpret=True)
    cfg_fwd = FlashConfig(block_q=256, block_k=512)
    cfg_bwd = FlashConfig(block_q=128, block_k=128)

    out, lse = flash_fwd(q, k, v, config=cfg_fwd, **kw)
    dq, dk, dv = flash_bwd(q, k, v, out, lse, dout, config=cfg_bwd, **kw)

    def loss(q_):
        o, _ = flash_fwd(q_, k, v, config=cfg_fwd, **kw)
        return float(jnp.sum(o * dout))

    eps = 1e-2
    idx = (0, 300, 0, 5)
    fd = (loss(q.at[idx].add(eps)) - loss(q.at[idx].add(-eps))) / (2 * eps)
    assert abs(fd - float(dq[idx])) < 5e-2, (fd, float(dq[idx]))
    # and the dropout *mask* must be identical across fwd block configs
    # (outputs differ only by accumulation-order rounding, not by mask)
    out2, _ = flash_fwd(q, k, v, config=FlashConfig(block_q=128, block_k=128), **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), atol=1e-5, rtol=1e-5
    )


def test_bwd_positions_path():
    """Varlen per-sequence-causal positions through the bwd kernel
    (round-1 C4 gap: positions path had no direct test)."""
    from flash_attn_tpu.ops.attention import flash_attention_varlen

    total, h, d = 192, 2, 32
    key = jax.random.PRNGKey(19)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (total, h, d))
    k = jax.random.normal(kk, (total, h, d))
    v = jax.random.normal(kv, (total, h, d))
    dout = jax.random.normal(kd, (total, h, d))
    cu = jnp.array([0, 80, 192], jnp.int32)

    def f(q_, k_, v_):
        return jnp.sum(
            flash_attention_varlen(q_, k_, v_, cu, cu, causal=True,
                                   interpret=True) * dout
        )

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    # oracle: per-sequence dense causal attention
    def oracle(q_, k_, v_):
        total_loss = 0.0
        for i in range(2):
            lo, hi = int(cu[i]), int(cu[i + 1])
            o = mha_reference(
                q_[None, lo:hi], k_[None, lo:hi], v_[None, lo:hi], causal=True
            )
            total_loss = total_loss + jnp.sum(o[0] * dout[lo:hi])
        return total_loss

    rdq, rdk, rdv = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_public_api_window_grads():
    """jax.grad through flash_attention with a window uses the Pallas bwd."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(20), 1, 128, 128, 2, 2, 64)

    def f(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=True, window=(16, 0),
                            interpret=True) * dout
        )

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rdq, rdk, rdv = mha_reference_vjp(q, k, v, dout, causal=True, window=(16, 0))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)


def test_public_api_bias_grads_pallas_default():
    """Default path (no dropout) routes through the Pallas bwd and returns a
    real dbias (round-1 Weak #2/#3)."""
    q, k, v, dout = make_qkv(jax.random.PRNGKey(21), 1, 128, 128, 2, 2, 64)
    bias = jax.random.normal(jax.random.PRNGKey(22), (1, 2, 128, 128))

    def f(q_, b_):
        return jnp.sum(
            flash_attention(q_, k, v, mask=b_, interpret=True) * dout
        )

    dq, dbias = jax.grad(f, argnums=(0, 1))(q, bias)

    def fr(q_, b_):
        return jnp.sum(mha_reference(q_, k, v, mask=b_) * dout)

    rdq, rdbias = jax.grad(fr, argnums=(0, 1))(q, bias)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rdbias),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                               atol=5e-4, rtol=5e-4)


def test_bwd_inkernel_rope_matches_materialized():
    """flash_bwd(rope_cos/sin) on un-rotated q == flash_bwd on materialized
    R(q) with dq pulled back through the rotation outside."""
    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import flash_fwd
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate, rope_unrotate

    key = jax.random.PRNGKey(80)
    B, S, H, Hk, D = 1, 256, 4, 2, 64
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hk, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hk, D), jnp.float32)
    dout = jax.random.normal(kd, (B, S, H, D), jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(S)[None], D, 10000.0)
    k_rot = rope_rotate(k, cos, sin)

    out, lse = flash_fwd(
        q, k_rot, v, causal=True, rope_cos=cos, rope_sin=sin, interpret=True
    )
    dq, dk, dv = flash_bwd(
        q, k_rot, v, out, lse, dout, causal=True,
        rope_cos=cos, rope_sin=sin, interpret=True,
    )

    q_rot = rope_rotate(q, cos, sin)
    out2, lse2 = flash_fwd(q_rot, k_rot, v, causal=True, interpret=True)
    dq2, dk2, dv2 = flash_bwd(
        q_rot, k_rot, v, out2, lse2, dout, causal=True, interpret=True
    )
    dq2 = rope_unrotate(dq2, cos, sin)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2), atol=1e-4)


def test_bwd_fp16():
    """fp16 gradients vs the fp32-oracle vjp (the reference dtype pair is
    exactly {fp16, bf16} via is_bf16, flash_attn.h:31)."""
    q, k, v, dout = make_qkv(
        jax.random.PRNGKey(30), 2, 128, 128, 2, 2, 64, dtype=jnp.float16
    )
    check_grads(q, k, v, dout, atol=2e-2, causal=True)
