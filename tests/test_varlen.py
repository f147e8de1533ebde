"""Varlen public API vs per-sequence oracles (flash_attn_varlen_fwd/bwd
parity, flash_attn.h:38-66,101-134)."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.ops.attention import flash_attention_varlen
from flash_attn_tpu.ops.reference import mha_reference
from flash_attn_tpu.ops.varlen import seqlens_to_cu_seqlens


def packed(key, lens, h, d, total):
    cu = seqlens_to_cu_seqlens(jnp.asarray(lens))
    x = jax.random.normal(key, (total, h, d))
    return x, cu


def test_varlen_fwd_matches_per_sequence():
    lens = [50, 78]
    total = 128
    q, cu = packed(jax.random.PRNGKey(0), lens, 4, 64, total)
    k, _ = packed(jax.random.PRNGKey(1), lens, 4, 64, total)
    v, _ = packed(jax.random.PRNGKey(2), lens, 4, 64, total)
    out = flash_attention_varlen(q, k, v, cu, cu, causal=True, interpret=True)
    start = 0
    for n in lens:
        sl = slice(start, start + n)
        want = mha_reference(q[None, sl], k[None, sl], v[None, sl], causal=True)[0]
        np.testing.assert_allclose(
            np.asarray(out[sl]), np.asarray(want), atol=2e-4, rtol=2e-4
        )
        start += n


def test_varlen_rect_q_shorter_than_k():
    # decode-style: q has 1 token/seq, k has the full history (bottom-right)
    qlens, klens = [1, 1], [40, 60]
    cu_q = seqlens_to_cu_seqlens(jnp.asarray(qlens))
    cu_k = seqlens_to_cu_seqlens(jnp.asarray(klens))
    q = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 32))
    k = jax.random.normal(jax.random.PRNGKey(4), (100, 2, 32))
    v = jax.random.normal(jax.random.PRNGKey(5), (100, 2, 32))
    out = flash_attention_varlen(q, k, v, cu_q, cu_k, causal=True, interpret=True)
    start = 0
    for i, (qn, kn) in enumerate(zip(qlens, klens)):
        sk = slice(start, start + kn)
        want = mha_reference(
            q[None, i : i + 1], k[None, sk], v[None, sk], causal=True
        )[0]
        np.testing.assert_allclose(
            np.asarray(out[i : i + 1]), np.asarray(want), atol=2e-4, rtol=2e-4
        )
        start += kn


def test_varlen_additive_mask():
    """attn_mask parity for the varlen fwd (flash_attn.h:65-66): an additive
    bias over the packed token axes, checked per sequence against the oracle
    with the corresponding mask sub-block."""
    lens = [50, 78]
    total = 128
    q, cu = packed(jax.random.PRNGKey(10), lens, 4, 64, total)
    k, _ = packed(jax.random.PRNGKey(11), lens, 4, 64, total)
    v, _ = packed(jax.random.PRNGKey(12), lens, 4, 64, total)
    mask = jax.random.normal(jax.random.PRNGKey(13), (total, total)) * 0.5
    out = flash_attention_varlen(
        q, k, v, cu, cu, causal=True, mask=mask, interpret=True
    )
    start = 0
    for n in lens:
        sl = slice(start, start + n)
        want = mha_reference(
            q[None, sl], k[None, sl], v[None, sl], causal=True,
            mask=mask[sl, sl][None, None],
        )[0]
        np.testing.assert_allclose(
            np.asarray(out[sl]), np.asarray(want), atol=2e-4, rtol=2e-4
        )
        start += n


def test_varlen_return_softmax():
    """softmax_ptr debug hook on the varlen path (flash_attn.h:45,59):
    returned probs rows reproduce the output and stay inside segments."""
    lens = [30, 34]
    total = 64
    q, cu = packed(jax.random.PRNGKey(14), lens, 2, 32, total)
    k, _ = packed(jax.random.PRNGKey(15), lens, 2, 32, total)
    v, _ = packed(jax.random.PRNGKey(16), lens, 2, 32, total)
    out, lse, probs = flash_attention_varlen(
        q, k, v, cu, cu, causal=True, return_softmax=True, interpret=True
    )
    assert probs.shape == (2, total, total)
    # probs @ v reproduces out
    recon = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(out), atol=2e-4, rtol=2e-4
    )
    # no probability mass crosses sequence boundaries
    pn = np.asarray(probs)
    assert np.abs(pn[:, : lens[0], lens[0] :]).max() == 0.0
    assert np.abs(pn[:, lens[0] :, : lens[0]]).max() == 0.0


def test_varlen_grad_runs():
    lens = [30, 34]
    q, cu = packed(jax.random.PRNGKey(6), lens, 2, 32, 64)
    k, _ = packed(jax.random.PRNGKey(7), lens, 2, 32, 64)
    v, _ = packed(jax.random.PRNGKey(8), lens, 2, 32, 64)

    def loss(q_, k_, v_):
        o = flash_attention_varlen(q_, k_, v_, cu, cu, causal=True, interpret=True)
        return jnp.sum(o**2)

    # grads vs per-sequence oracle grads
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def oracle_loss(q_, k_, v_):
        tot = 0.0
        start = 0
        for n in lens:
            sl = slice(start, start + n)
            o = mha_reference(q_[None, sl], k_[None, sl], v_[None, sl], causal=True)[0]
            tot = tot + jnp.sum(o**2)
            start += n
        return tot

    rdq, rdk, rdv = jax.grad(oracle_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4, rtol=5e-4)
