"""Pallas FA2 forward vs the pure-jnp oracle (SURVEY.md §4 obligation 1).

Tolerances are keyed to dtype: the kernel may differ from the fp32 oracle by
a small multiple of the input dtype's own rounding error (FA2 test practice).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd
from flash_attn_tpu.ops.reference import mha_reference

TOL = {jnp.float32: 2e-5, jnp.bfloat16: 2e-2, jnp.float16: 2e-3}


def make_qkv(key, batch, sq, sk, h, hk, d, dtype):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (batch, sk, hk, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (batch, sk, hk, d), dtype=jnp.float32)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


def check(q, k, v, *, lse_rtol=1e-5, **kw):
    out, lse = flash_fwd(q, k, v, interpret=True, **kw)
    ref_out, ref_lse = mha_reference(q, k, v, return_lse=True, **kw)
    tol = TOL[q.dtype.type]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=tol * 10, rtol=tol * 10,
    )
    # LSE in fp32: tight check (finite rows only; -inf rows must agree
    # exactly).  fp16 computes as bf16 on TPU (no f16 in Mosaic) so its
    # LSE carries half-precision input rounding, not fp32 tightness.
    ref_lse = np.asarray(ref_lse)
    got_lse = np.asarray(lse)
    finite = np.isfinite(ref_lse)
    ltol = max(1e-3, tol * 10)
    np.testing.assert_allclose(got_lse[finite], ref_lse[finite], rtol=ltol, atol=ltol)
    assert np.all(got_lse[~finite] <= -1e29)
    return out, lse


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
@pytest.mark.parametrize("causal", [False, True])
def test_dense_basic(dtype, causal):
    # fp16 is in the set because the reference dtype pair is exactly
    # {fp16, bf16} (is_bf16, flash_attn.h:31)
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, 256, 256, 4, 4, 64, dtype)
    check(q, k, v, causal=causal)


@pytest.mark.parametrize("sq,sk", [(128, 384), (384, 128), (200, 300), (1, 256)])
def test_rect_and_ragged_shapes(sq, sk):
    # Non-block-multiple shapes exercise the in-kernel padding mask
    # (the reference forces callers to pre-round instead, flash_attn.h:20-21).
    q, k, v = make_qkv(jax.random.PRNGKey(1), 2, sq, sk, 2, 2, 64, jnp.float32)
    check(q, k, v, causal=False)
    check(q, k, v, causal=True)


@pytest.mark.parametrize("h,hk", [(8, 1), (8, 2), (4, 4)])
def test_gqa_mqa(h, hk):
    # num_heads vs num_heads_k broadcast (flash_attn.h:22-23)
    q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 128, 256, h, hk, 64, jnp.float32)
    check(q, k, v, causal=True)


def test_additive_mask():
    # attn_mask parity (flash_attn.h:35-36): arbitrary additive bias
    q, k, v = make_qkv(jax.random.PRNGKey(3), 2, 128, 128, 2, 2, 64, jnp.float32)
    mask = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 128, 128))
    out, lse = flash_fwd(q, k, v, bias=mask, interpret=True)
    ref_out, ref_lse = mha_reference(q, k, v, mask=mask, return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=1e-3, atol=1e-3)


def test_broadcast_mask():
    q, k, v = make_qkv(jax.random.PRNGKey(5), 2, 128, 128, 2, 2, 64, jnp.float32)
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(6), 0.8, (1, 1, 128, 128)),
        0.0, float("-inf"),
    )
    out, _ = flash_fwd(q, k, v, bias=mask, interpret=True)
    ref_out = mha_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)


def test_segment_ids():
    # varlen packing semantics (flash_attn.h:41-42)
    batch, s = 2, 256
    q, k, v = make_qkv(jax.random.PRNGKey(7), batch, s, s, 2, 2, 64, jnp.float32)
    seg = jnp.concatenate([
        jnp.full((batch, 100), 1, jnp.int32),
        jnp.full((batch, 100), 2, jnp.int32),
        jnp.zeros((batch, 56), jnp.int32),
    ], axis=1)
    out, lse = flash_fwd(q, k, v, q_segment_ids=seg, kv_segment_ids=seg, interpret=True)
    ref_out, ref_lse = mha_reference(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, return_lse=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)
    finite = np.isfinite(np.asarray(ref_lse))
    np.testing.assert_allclose(
        np.asarray(lse)[finite], np.asarray(ref_lse)[finite], rtol=1e-3, atol=1e-3
    )


def test_segment_ids_with_causal():
    batch, s = 1, 128
    q, k, v = make_qkv(jax.random.PRNGKey(8), batch, s, s, 2, 2, 64, jnp.float32)
    seg = jnp.concatenate([
        jnp.full((batch, 64), 1, jnp.int32),
        jnp.full((batch, 64), 2, jnp.int32),
    ], axis=1)
    out, _ = flash_fwd(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True, interpret=True
    )
    ref_out = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)


def test_scale_override():
    # softmax_scale parity (flash_attn.h:27)
    q, k, v = make_qkv(jax.random.PRNGKey(9), 1, 128, 128, 2, 2, 64, jnp.float32)
    out, _ = flash_fwd(q, k, v, scale=0.5, interpret=True)
    ref_out = mha_reference(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)


def test_small_blocks_config():
    q, k, v = make_qkv(jax.random.PRNGKey(10), 1, 512, 512, 2, 2, 64, jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128)
    out, _ = flash_fwd(q, k, v, causal=True, config=cfg, interpret=True)
    ref_out = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)


def test_long_context_bf16_stability():
    # many k blocks -> online rescaling must stay stable
    q, k, v = make_qkv(jax.random.PRNGKey(11), 1, 128, 2048, 2, 2, 64, jnp.bfloat16)
    check(q, k, v, causal=False)


def test_window_in_kernel():
    """In-kernel local-attention window == oracle window mask."""
    q, k, v = make_qkv(jax.random.PRNGKey(12), 1, 256, 256, 2, 2, 64, jnp.float32)
    for window in [(32, 0), (16, 16), (-1, 8)]:
        out, _ = flash_fwd(q, k, v, window=window, interpret=True)
        ref = mha_reference(q, k, v, window=window)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=str(window),
        )
    # window + causal compose
    out, _ = flash_fwd(q, k, v, causal=True, window=(64, -1), interpret=True)
    ref = mha_reference(q, k, v, causal=True, window=(64, -1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_return_softmax_kernel_path():
    """Kernel-path probability materialization (softmax_ptr debug hook,
    flash_attn.h:15,30): P from the kernel == oracle's post-softmax matrix,
    rows sum to 1, masked/above-diagonal entries are exactly 0."""
    q, k, v = make_qkv(jax.random.PRNGKey(30), 2, 192, 256, 4, 2, 64,
                       jnp.float32)
    for causal in (False, True):
        out, lse, probs = flash_fwd(
            q, k, v, causal=causal, interpret=True, return_softmax=True,
            config=FlashConfig(block_q=64, block_k=128),
        )
        ref = mha_reference(q, k, v, causal=causal, return_softmax=True)
        ref_probs = np.asarray(ref[-1])
        np.testing.assert_allclose(
            np.asarray(probs), ref_probs, atol=1e-5, rtol=1e-4
        )
        assert np.all(np.asarray(probs)[ref_probs == 0.0] == 0.0)
        # rows sum to 1 up to fp32 renormalization noise: each entry carries
        # ~1 ulp from the praw * exp(mblk - lse) round trip, and rows have up
        # to 256 entries, so the sum can drift a hair past 1e-4
        np.testing.assert_allclose(
            np.asarray(probs).sum(-1), 1.0, atol=3e-4
        )


def test_return_softmax_dropout_recompose():
    """With dropout, kernel P is the post-dropout matrix: out == P @ V."""
    q, k, v = make_qkv(jax.random.PRNGKey(31), 1, 128, 128, 4, 4, 64,
                       jnp.float32)
    out, lse, probs = flash_fwd(
        q, k, v, causal=True, dropout_rate=0.3, dropout_seed=7,
        interpret=True, return_softmax=True,
        config=FlashConfig(block_q=64, block_k=64),
    )
    recomp = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(recomp), atol=1e-5, rtol=1e-4
    )
    # dropout actually dropped something
    zeros = (np.asarray(probs) == 0.0).mean()
    assert zeros > 0.2


def test_split_causal_mask_identical():
    """split_causal_mask is a pure perf knob: bitwise-identical output."""
    q, k, v = make_qkv(jax.random.PRNGKey(32), 1, 256, 256, 4, 2, 64,
                       jnp.bfloat16)
    outs = []
    for split in (False, True):
        cfg = FlashConfig(block_q=64, block_k=64, split_causal_mask=split)
        out, lse = flash_fwd(q, k, v, causal=True, config=cfg, interpret=True)
        outs.append((np.asarray(out, np.float32), np.asarray(lse)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


@pytest.mark.parametrize("sq,sk", [(256, 256), (192, 448), (448, 192)])
def test_triangular_grid_identical(sq, sk):
    """The flattened triangular causal grid is a pure perf knob: bitwise-
    identical out and lse vs the full rectangular grid, including
    bottom-right-aligned rectangular shapes (fully-masked top rows when
    sk < sq; off-diagonal last blocks when sk > sq)."""
    q, k, v = make_qkv(jax.random.PRNGKey(33), 2, sq, sk, 4, 2, 64,
                       jnp.bfloat16)
    outs = []
    for tri in (False, True):
        cfg = FlashConfig(block_q=64, block_k=128, triangular=tri)
        out, lse = flash_fwd(q, k, v, causal=True, config=cfg, interpret=True)
        outs.append((np.asarray(out, np.float32), np.asarray(lse)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_triangular_grid_dropout_grad_replay():
    """Dropout mask replay is block-layout independent: grads through the
    triangular-fwd + rectangular-bwd pairing stay finite and match the
    non-triangular pairing exactly."""
    from flash_attn_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(jax.random.PRNGKey(34), 1, 256, 256, 2, 2, 64,
                       jnp.float32)

    def loss(q_, k_, v_, tri):
        cfg = FlashConfig(block_q=64, block_k=128, triangular=tri)
        o = flash_attention(q_, k_, v_, causal=True, dropout_rate=0.2,
                            dropout_seed=11, config=cfg, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g0 = jax.grad(loss)(q, k, v, False)
    g1 = jax.grad(loss)(q, k, v, True)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_bf16_softmax_accuracy_bounded():
    """softmax_dtype='bf16' (halved VPU passes) stays within a small
    multiple of the f32-softmax kernel's own bf16 error vs the fp32
    oracle — FA2-style tolerance."""
    q, k, v = make_qkv(jax.random.PRNGKey(40), 2, 512, 512, 8, 2, 64,
                       jnp.bfloat16)
    ref = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True,
    )
    errs = {}
    for sd in ("f32", "bf16"):
        cfg = FlashConfig(block_q=64, block_k=128, softmax_dtype=sd)
        out, _ = flash_fwd(q, k, v, causal=True, config=cfg, interpret=True)
        errs[sd] = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert errs["bf16"] < max(3.0 * errs["f32"], 3e-2), errs


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("causal", [False, True])
def test_clamped_softmax_matches_oracle(dtype, causal):
    """softmax_mode='clamped' (no running max; p = 2^min(s, 80)) is exact
    whenever no score reaches the clamp — same tolerance class as the
    online-softmax kernel vs the fp32 oracle."""
    q, k, v = make_qkv(jax.random.PRNGKey(50), 2, 320, 320, 4, 2, 64, dtype)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped")
    out, lse = flash_fwd(q, k, v, causal=causal, config=cfg, interpret=True)
    ref_out, ref_lse = mha_reference(q, k, v, causal=causal, return_lse=True)
    tol = TOL[q.dtype.type]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=tol * 10, rtol=tol * 10)
    # bf16 scores feed exp2 unsubtracted in clamped mode, so lse carries
    # |s|*2^-9 argument rounding that the online kernel's m-subtract avoids.
    ltol = 1e-3 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=ltol, atol=ltol)


def test_clamped_softmax_segments_window_bias():
    """Clamped mode composes with every masking feature: masked entries
    exp2(NEG_INF) to exactly zero without running-max bookkeeping."""
    q, k, v = make_qkv(jax.random.PRNGKey(51), 2, 256, 256, 4, 4, 64,
                       jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped")
    segs = jnp.concatenate(
        [jnp.zeros((2, 128), jnp.int32), jnp.ones((2, 128), jnp.int32)], axis=1
    )
    for kw in (
        dict(causal=True, q_segment_ids=segs, kv_segment_ids=segs),
        dict(causal=True, window=(32, 0)),
        dict(causal=False, bias=jax.random.normal(
            jax.random.PRNGKey(52), (2, 4, 256, 256), jnp.float32)),
    ):
        out, _ = flash_fwd(q, k, v, config=cfg, interpret=True, **kw)
        if "bias" in kw:
            kw["mask"] = kw.pop("bias")
        ref = mha_reference(q, k, v, **kw)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-4, rtol=2e-4)


def test_clamped_softmax_dropout_grad_matches_online():
    """Dropout masks key on absolute coords, so clamped and online modes
    replay identically; grads agree to fp32 reassociation tolerance."""
    from flash_attn_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(jax.random.PRNGKey(53), 1, 256, 256, 2, 2, 64,
                       jnp.float32)

    def loss(q_, k_, v_, mode):
        cfg = FlashConfig(block_q=64, block_k=128, softmax_mode=mode)
        o = flash_attention(q_, k_, v_, causal=True, dropout_rate=0.2,
                            dropout_seed=7, config=cfg, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g0 = jax.grad(loss)(q, k, v, "online")
    g1 = jax.grad(loss)(q, k, v, "clamped")
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-4)


def test_clamped_softmax_large_scores_graceful():
    """Scores beyond the clamp (base-2 80) degrade gracefully — no NaN/inf,
    output stays a convex combination of V rows."""
    q, k, v = make_qkv(jax.random.PRNGKey(54), 1, 128, 128, 2, 2, 64,
                       jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped")
    out, lse = flash_fwd(q * 100.0, k * 100.0, v, causal=False, config=cfg,
                         interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(v))) + 1e-3


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_inkernel_rope_matches_outside_rotation(dtype):
    """In-kernel q-side RoPE (rope_cos/rope_sin) == rotating q outside and
    calling the kernel plain.  Scale pre-fold commutes with the rotation."""
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate

    q, k, v = make_qkv(jax.random.PRNGKey(60), 2, 200, 200, 4, 2, 64, dtype)
    pos = jnp.broadcast_to(jnp.arange(200)[None], (2, 200))
    cos, sin = rope_cos_sin(pos, 64, 10000.0)
    k_rot = rope_rotate(k, cos, sin)

    out_in, lse_in = flash_fwd(
        q, k_rot, v, causal=True, rope_cos=cos, rope_sin=sin, interpret=True
    )
    out_ref, lse_ref = flash_fwd(
        rope_rotate(q, cos, sin), k_rot, v, causal=True, interpret=True
    )
    tol = TOL[q.dtype.type]
    np.testing.assert_allclose(
        np.asarray(out_in, np.float32), np.asarray(out_ref, np.float32),
        atol=tol * 10, rtol=tol * 10,
    )
    fin = np.isfinite(np.asarray(lse_ref))
    # kernel-vs-kernel on bf16 inputs: the exp2 LOG2E pre-fold shifts which
    # way a handful of bf16 roundings land between the two rotation orders
    np.testing.assert_allclose(
        np.asarray(lse_in)[fin], np.asarray(lse_ref)[fin], rtol=3e-3, atol=3e-3
    )


def test_inkernel_rope_2d_table_and_window():
    """[Sq, D/2] rope tables broadcast over batch; composes with window."""
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate

    q, k, v = make_qkv(jax.random.PRNGKey(61), 2, 160, 160, 2, 2, 64,
                       jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(160), 64, 500000.0)
    k_rot = rope_rotate(k, cos[None], sin[None])
    out_in, _ = flash_fwd(
        q, k_rot, v, causal=True, window=(32, 0),
        rope_cos=cos, rope_sin=sin, interpret=True,
    )
    out_ref, _ = flash_fwd(
        rope_rotate(q, cos[None], sin[None]), k_rot, v,
        causal=True, window=(32, 0), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_in), np.asarray(out_ref), atol=2e-4, rtol=2e-4
    )


def test_inkernel_rope_grad():
    """jax.grad through flash_attention(rope_cos/sin) == jax.grad through
    the explicit outside rotation (dq pulled back through the orthogonal
    rotation in _core_bwd)."""
    from flash_attn_tpu.ops.attention import flash_attention
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate

    q, k, v = make_qkv(jax.random.PRNGKey(62), 1, 192, 192, 2, 2, 64,
                       jnp.float32)
    pos = jnp.arange(192)[None]
    cos, sin = rope_cos_sin(pos, 64, 10000.0)

    def loss_inkernel(q_, k_, v_):
        o = flash_attention(q_, rope_rotate(k_, cos, sin), v_, causal=True,
                            rope_cos=cos, rope_sin=sin, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_outside(q_, k_, v_):
        o = flash_attention(rope_rotate(q_, cos, sin),
                            rope_rotate(k_, cos, sin), v_, causal=True,
                            interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g0 = jax.grad(loss_inkernel, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_outside, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_head_dim_256():
    """Gemma-class head_dim=256 through fwd and bwd (tile = 2 MXU lanes)."""
    from flash_attn_tpu.ops.flash_bwd import flash_bwd

    q, k, v = make_qkv(jax.random.PRNGKey(70), 1, 256, 256, 2, 2, 256,
                       jnp.float32)
    out, lse = check(q, k, v, causal=True)
    dout = jax.random.normal(jax.random.PRNGKey(71), q.shape, jnp.float32)
    dq, dk, dv = flash_bwd(q, k, v, out, lse, dout, causal=True,
                           interpret=True)
    from flash_attn_tpu.ops.reference import mha_reference_vjp

    wq, wk, wv = mha_reference_vjp(q, k, v, dout, causal=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wv), atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_logit_softcap_matches_oracle(causal):
    """Gemma-2-style cap*tanh(s/cap) in-kernel == capped oracle."""
    q, k, v = make_qkv(jax.random.PRNGKey(75), 2, 192, 192, 4, 2, 64,
                       jnp.float32)
    out, lse = flash_fwd(q * 4.0, k * 4.0, v, causal=causal,
                         logit_softcap=30.0, interpret=True)
    ref_out, ref_lse = mha_reference(
        q * 4.0, k * 4.0, v, causal=causal, logit_softcap=30.0,
        return_lse=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    fin = np.isfinite(np.asarray(ref_lse))
    np.testing.assert_allclose(np.asarray(lse)[fin],
                               np.asarray(ref_lse)[fin], rtol=1e-3, atol=1e-3)


def test_logit_softcap_clamped_mode_matches_online():
    """softcap composes with the clamped (no-running-max, base-2) softmax."""
    q, k, v = make_qkv(jax.random.PRNGKey(76), 1, 128, 128, 2, 2, 64,
                       jnp.float32)
    cfg_on = FlashConfig(block_q=64, block_k=128)
    cfg_cl = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped")
    o1, l1 = flash_fwd(q, k, v, causal=True, logit_softcap=20.0,
                       config=cfg_on, interpret=True)
    o2, l2 = flash_fwd(q, k, v, causal=True, logit_softcap=20.0,
                       config=cfg_cl, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=1e-4, rtol=1e-4)


def test_logit_softcap_grad_matches_oracle():
    """jax.grad through the capped kernel (incl. dbias, which must NOT chain
    through the tanh) == jax.grad of the capped oracle."""
    from flash_attn_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(jax.random.PRNGKey(77), 1, 160, 160, 2, 2, 64,
                       jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(78), (1, 1, 160, 160),
                             jnp.float32)

    def loss_kernel(q_, k_, v_, b_):
        o = flash_attention(q_ * 3.0, k_ * 3.0, v_, mask=b_, causal=True,
                            logit_softcap=25.0, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_oracle(q_, k_, v_, b_):
        o = mha_reference(q_ * 3.0, k_ * 3.0, v_, mask=b_, causal=True,
                          logit_softcap=25.0)
        return jnp.sum(o ** 2)

    g0 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g1 = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("causal", [False, True])
def test_alibi_matches_oracle(causal):
    """In-kernel ALiBi == capped oracle (upstream flash-attn
    -slope*|i+Sk-Sq-j| semantic), incl. rectangular shapes."""
    from flash_attn_tpu.ops.alibi import alibi_slopes

    q, k, v = make_qkv(jax.random.PRNGKey(80), 2, 150, 200, 6, 2, 64,
                       jnp.float32)
    sl = jnp.asarray(alibi_slopes(6))
    out, lse = flash_fwd(q, k, v, causal=causal, alibi_slopes=sl,
                         interpret=True)
    ref_out, ref_lse = mha_reference(q, k, v, causal=causal,
                                     alibi_slopes=sl, return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    fin = np.isfinite(np.asarray(ref_lse))
    np.testing.assert_allclose(np.asarray(lse)[fin],
                               np.asarray(ref_lse)[fin], rtol=1e-3, atol=1e-3)


def test_alibi_grad_matches_oracle():
    from flash_attn_tpu.ops.alibi import alibi_slopes
    from flash_attn_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(jax.random.PRNGKey(81), 1, 160, 160, 4, 2, 32,
                       jnp.float32)
    sl = jnp.asarray(alibi_slopes(4))

    def loss_kernel(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, alibi_slopes=sl,
                            interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_oracle(q_, k_, v_):
        o = mha_reference(q_, k_, v_, causal=True, alibi_slopes=sl)
        return jnp.sum(o ** 2)

    g0 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_alibi_slope_schedule():
    from flash_attn_tpu.ops.alibi import alibi_slopes

    s8 = alibi_slopes(8)
    # power-of-2 schedule: geometric with ratio 2^-1 for n=8
    np.testing.assert_allclose(s8, [2.0 ** -(i + 1) for i in range(8)],
                               rtol=1e-6)
    s6 = alibi_slopes(6)
    assert s6.shape == (6,) and np.all(s6 > 0) and np.all(np.diff(s6[:4]) < 0)


@pytest.mark.parametrize("causal", [False, True])
def test_clamped_verify_in_range(causal):
    """softmax_mode='clamped_verify': normal-scale scores are flagged
    valid on every row and the output matches clamped/oracle."""
    q, k, v = make_qkv(jax.random.PRNGKey(70), 1, 256, 256, 4, 2, 64,
                       jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped_verify")
    out, lse, valid = flash_fwd(q, k, v, causal=causal, config=cfg,
                                interpret=True)
    assert np.all(np.asarray(valid) == 1.0)
    ref_out, ref_lse = mha_reference(q, k, v, causal=causal, return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=1e-3, rtol=1e-3)


def test_clamped_verify_flags_out_of_range():
    """Rows whose scores exceed the clamp are flagged invalid (these are
    exactly the rows where plain clamped mode would be inexact)."""
    q, k, v = make_qkv(jax.random.PRNGKey(71), 1, 128, 128, 2, 2, 64,
                       jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped_verify")
    _, _, valid = flash_fwd(q * 100.0, k * 100.0, v, config=cfg,
                            interpret=True)
    assert np.asarray(valid).min() == 0.0


@pytest.mark.parametrize("big", [False, True])
def test_auto_mode_exact_both_regimes(big):
    """softmax_mode='auto' == online everywhere: clamped-speed in range,
    lax.cond fallback to the online kernel when scores leave the window."""
    q, k, v = make_qkv(jax.random.PRNGKey(72), 1, 256, 256, 4, 2, 64,
                       jnp.float32)
    if big:
        q, k = q * 100.0, k * 100.0
    cfg_auto = FlashConfig(block_q=64, block_k=128, softmax_mode="auto")
    cfg_online = FlashConfig(block_q=64, block_k=128, softmax_mode="online")
    out_a, lse_a = jax.jit(
        lambda q_, k_, v_: flash_fwd(
            q_, k_, v_, causal=True, config=cfg_auto, interpret=True
        )
    )(q, k, v)
    out_o, lse_o = flash_fwd(q, k, v, causal=True, config=cfg_online,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_o),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_a), np.asarray(lse_o),
                               atol=1e-3, rtol=1e-3)


def test_clamped_lse_valid_helper():
    """clamped_lse_valid reads only the clamped kernel's lse: true for
    in-range scores (incl. dead causal rows when Sk < Sq), false once any
    element clamps."""
    from flash_attn_tpu.ops.flash_fwd import clamped_lse_valid

    q, k, v = make_qkv(jax.random.PRNGKey(80), 1, 128, 128, 2, 2, 64,
                       jnp.float32)
    cfg = FlashConfig(block_q=64, block_k=128, softmax_mode="clamped")
    _, lse = flash_fwd(q, k, v, causal=True, config=cfg, interpret=True)
    assert bool(clamped_lse_valid(lse, 128, 128, causal=True))
    _, lse_big = flash_fwd(q * 100, k * 100, v, causal=True, config=cfg,
                           interpret=True)
    assert not bool(clamped_lse_valid(lse_big, 128, 128, causal=True))
    # bottom-right causal with Sk < Sq: leading rows are dead (-inf lse)
    # and must count as exact
    q2, k2, v2 = make_qkv(jax.random.PRNGKey(81), 1, 128, 64, 2, 2, 64,
                          jnp.float32)
    _, lse2 = flash_fwd(q2, k2[:, :64], v2[:, :64], causal=True, config=cfg,
                        interpret=True)
    assert bool(clamped_lse_valid(lse2, 128, 64, causal=True))
