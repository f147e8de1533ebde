"""Sanity tests for the oracle layer itself (lse algebra, varlen helpers)."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.ops.lse import lse_merge, lse_merge2
from flash_attn_tpu.ops.reference import mha_reference
from flash_attn_tpu.ops.varlen import (
    cu_seqlens_to_segment_ids,
    segment_ids_to_positions,
    seqlens_to_cu_seqlens,
)


def test_reference_softmax_rows_sum_to_one():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 16, 2, 32))
    out, lse, probs = mha_reference(q, q, q, return_lse=True, return_softmax=True)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
    assert out.shape == (1, 16, 2, 32)
    assert lse.shape == (1, 2, 16)


def test_lse_merge_equals_full_attention():
    """Ring/flash-decode oracle: split KV in two, attend separately, merge
    with LSE algebra -> must equal attention over the full KV exactly
    (the flash_attn.h:16 LSE residual is precisely what enables this)."""
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 32, 2, 64))
    k = jax.random.normal(kk, (2, 128, 2, 64))
    v = jax.random.normal(kv, (2, 128, 2, 64))

    full_out, full_lse = mha_reference(q, k, v, return_lse=True)

    o1, l1 = mha_reference(q, k[:, :64], v[:, :64], return_lse=True)
    o2, l2 = mha_reference(q, k[:, 64:], v[:, 64:], return_lse=True)
    # outs: [B,S,H,D], lses: [B,H,S] -> move to [B,S,H] to align with out[...,:-1]
    o = jnp.stack([o1, o2])
    l = jnp.stack([
        jnp.transpose(l1, (0, 2, 1)),
        jnp.transpose(l2, (0, 2, 1)),
    ])
    merged_out, merged_lse = lse_merge(o, l, axis=0)
    np.testing.assert_allclose(np.asarray(merged_out), np.asarray(full_out), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(merged_lse), np.asarray(jnp.transpose(full_lse, (0, 2, 1))),
        atol=1e-4, rtol=1e-4,
    )

    m2_out, m2_lse = lse_merge2(
        o1, jnp.transpose(l1, (0, 2, 1)), o2, jnp.transpose(l2, (0, 2, 1))
    )
    np.testing.assert_allclose(np.asarray(m2_out), np.asarray(full_out), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m2_lse), np.asarray(jnp.transpose(full_lse, (0, 2, 1))),
        atol=1e-4, rtol=1e-4,
    )


def test_lse_merge_with_fully_masked_partial():
    key = jax.random.PRNGKey(2)
    o1 = jax.random.normal(key, (4, 8))
    l1 = jax.random.normal(key, (4,))
    o2 = jnp.zeros((4, 8))
    l2 = jnp.full((4,), float("-inf"))
    out, lse = lse_merge2(o1, l1, o2, l2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(l1), atol=1e-6)


def test_cu_seqlens_roundtrip():
    cu = seqlens_to_cu_seqlens(jnp.array([3, 5, 2]))
    np.testing.assert_array_equal(np.asarray(cu), [0, 3, 8, 10])
    seg = cu_seqlens_to_segment_ids(cu, 12)
    np.testing.assert_array_equal(
        np.asarray(seg), [1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 0, 0]
    )
    pos = segment_ids_to_positions(seg)
    np.testing.assert_array_equal(
        np.asarray(pos), [0, 1, 2, 0, 1, 2, 3, 4, 0, 1, 0, 1]
    )


def test_reference_gqa_matches_repeated_heads():
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 16, 4, 32))
    k = jax.random.normal(kk, (1, 16, 2, 32))
    v = jax.random.normal(kv, (1, 16, 2, 32))
    out_gqa = mha_reference(q, k, v)
    out_rep = mha_reference(q, jnp.repeat(k, 2, axis=2), jnp.repeat(v, 2, axis=2))
    np.testing.assert_allclose(np.asarray(out_gqa), np.asarray(out_rep), atol=1e-6)


def test_reference_dropout_statistics_and_determinism():
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (1, 64, 2, 32))
    rng = jax.random.PRNGKey(7)
    out1 = mha_reference(q, q, q, dropout_rate=0.5, dropout_rng=rng)
    out2 = mha_reference(q, q, q, dropout_rate=0.5, dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    _, _, probs = mha_reference(
        q, q, q, dropout_rate=0.5, dropout_rng=rng, return_lse=True, return_softmax=True
    )
    frac_zero = float(np.mean(np.asarray(probs) == 0.0))
    assert 0.4 < frac_zero < 0.6
