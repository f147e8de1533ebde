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
