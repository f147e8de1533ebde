"""Flash-decode kernel vs oracle: split-KV merge, kv_length masking, GQA,
quantized KV with fused dequant (B4/B5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.decode import flash_decode
from flash_attn_tpu.ops.quant import quantize_kv
from flash_attn_tpu.ops.reference import mha_reference


def setup(key, batch, s, h, hk, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, h, d))
    k = jax.random.normal(kk, (batch, s, hk, d))
    v = jax.random.normal(kv, (batch, s, hk, d))
    return q, k, v


def oracle(q, k, v, kv_length=None):
    """Decode == attention with Sq=1 over the valid prefix of the cache."""
    batch, h, d = q.shape
    s = k.shape[1]
    if kv_length is None:
        kv_length = jnp.full((batch,), s, jnp.int32)
    mask = jnp.where(
        jnp.arange(s)[None, None, None, :] < kv_length[:, None, None, None],
        0.0, float("-inf"),
    )
    out = mha_reference(q[:, None], k, v, mask=mask)
    return out[:, 0]


@pytest.mark.parametrize("use_kernel", [False, True])
def test_decode_full_cache(use_kernel):
    q, k, v = setup(jax.random.PRNGKey(0), 2, 512, 4, 4, 64)
    got = flash_decode(q, k, v, use_kernel=use_kernel, interpret=True, num_splits=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(oracle(q, k, v)), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("use_kernel", [False, True])
def test_decode_partial_lengths(use_kernel):
    q, k, v = setup(jax.random.PRNGKey(1), 3, 384, 4, 4, 64)
    kv_length = jnp.array([1, 200, 384], jnp.int32)
    got = flash_decode(
        q, k, v, kv_length=kv_length, use_kernel=use_kernel, interpret=True,
        num_splits=3,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(oracle(q, k, v, kv_length)), atol=2e-4, rtol=2e-4
    )


def test_decode_gqa():
    q, k, v = setup(jax.random.PRNGKey(2), 2, 256, 8, 2, 64)
    got = flash_decode(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(oracle(q, jnp.repeat(k, 4, 2), jnp.repeat(v, 4, 2))),
        atol=2e-4, rtol=2e-4,
    )


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_decode_quantized_kv(mode):
    """Fused-dequant decode vs dequantize-then-float oracle: must match the
    oracle on the SAME quantized values (exact fusion, no extra error)."""
    q, k, v = setup(jax.random.PRNGKey(3), 2, 256, 4, 4, 64)
    kq, ks, vq, vs = quantize_kv(k, v, mode)
    from flash_attn_tpu.ops.quant import dequantize

    kd = dequantize(kq, ks)
    vd = dequantize(vq, vs)
    got = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, interpret=True)
    want = oracle(q, kd, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
    # and the quantized result is close to the float result
    full = oracle(q, k, v)
    assert float(jnp.mean(jnp.abs(got - full))) < 0.05


def test_decode_bhsd_layout_matches_bshd():
    """BHSD-native decode == BSHD decode (same cache, transposed)."""
    import jax.numpy as jnp

    q, k, v = setup(jax.random.PRNGKey(11), 2, 384, 8, 2, 64)
    kv_length = jnp.array([100, 384], jnp.int32)
    want = flash_decode(q, k, v, kv_length=kv_length, interpret=True)
    got = flash_decode(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        kv_length=kv_length, kv_layout="bhsd", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_decode_bhsd_quantized():
    import jax.numpy as jnp

    q, k, v = setup(jax.random.PRNGKey(12), 2, 256, 4, 4, 64)
    kq, ks, vq, vs = quantize_kv(k, v, "int8")
    want = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, interpret=True)
    got = flash_decode(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
        k_scale=jnp.swapaxes(ks, 1, 2), v_scale=jnp.swapaxes(vs, 1, 2),
        kv_layout="bhsd", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_fast_fp8_cast_decode_matches_oracle():
    """Manual e4m3 bit-decode == dequantize-then-float oracle (normals)."""
    import jax.numpy as jnp

    q, k, v = setup(jax.random.PRNGKey(13), 1, 256, 4, 2, 64)
    q = q.astype(jnp.bfloat16)
    kq, ks, vq, vs = quantize_kv(k, v, "fp8")
    from flash_attn_tpu.ops.quant import dequantize

    got = flash_decode(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
        k_scale=jnp.swapaxes(ks, 1, 2), v_scale=jnp.swapaxes(vs, 1, 2),
        kv_layout="bhsd", interpret=True,
    )
    want = oracle(
        q.astype(jnp.float32), dequantize(kq, ks), dequantize(vq, vs)
    )
    # bf16 compute + denormal flush: tolerance at bf16 level
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32) - want))) < 0.05


@pytest.mark.parametrize("nsp", [2, 4])
def test_decode_kernel_split_kv(nsp):
    """Pallas-path split-KV (flash_attn.h:94): the split grid axis + outside
    lse_merge must match the unsplit kernel and the oracle, including ragged
    kv_length whose live region is confined to a subset of the splits."""
    q, k, v = setup(jax.random.PRNGKey(20), 3, 512, 4, 2, 64)
    lens = jnp.asarray([512, 100, 1], jnp.int32)
    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    want = oracle(q, k, v, lens)
    got, lse = flash_decode(
        q, kt, vt, kv_length=lens, kv_layout="bhsd", block_k=128,
        num_splits=nsp, interpret=True, return_lse=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    ref_lse = flash_decode(
        q, kt, vt, kv_length=lens, kv_layout="bhsd", block_k=128,
        interpret=True, return_lse=True,
    )[1]
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-4, rtol=2e-4)


def test_decode_kernel_split_kv_quantized():
    q, k, v = setup(jax.random.PRNGKey(21), 2, 384, 4, 4, 64)
    kq, ks, vq, vs = quantize_kv(k, v, "int8")
    want = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, use_kernel=False)
    got = flash_decode(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
        k_scale=jnp.swapaxes(ks, 1, 2), v_scale=jnp.swapaxes(vs, 1, 2),
        kv_layout="bhsd", block_k=128, num_splits=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def chunk_oracle(q, k, v, kv_length):
    """Chunk decode == per-token flash_decode over growing prefixes: chunk
    token t of sequence b attends to positions < kv_length[b] - T + 1 + t."""
    B, T, H, D = q.shape
    outs = []
    for t in range(T):
        lens_t = kv_length - (T - 1 - t)
        outs.append(oracle(q[:, t], k, v, lens_t))
    return jnp.stack(outs, axis=1)  # [B, T, H, D]


@pytest.mark.parametrize("use_kernel", [False, True])
def test_decode_chunk_matches_oracle(use_kernel):
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    B, S, T, H, Hk, D = 2, 384, 4, 8, 2, 64
    key = jax.random.PRNGKey(30)
    q = jax.random.normal(key, (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(31), (B, S, Hk, D))
    v = jax.random.normal(jax.random.PRNGKey(32), (B, S, Hk, D))
    lens = jnp.asarray([384, 100], jnp.int32)
    want = chunk_oracle(q, k, v, lens)
    kwargs = dict(kv_length=lens, interpret=True, use_kernel=use_kernel)
    if use_kernel:
        got = flash_decode_chunk(
            q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            kv_layout="bhsd", block_k=128, **kwargs,
        )
    else:
        got = flash_decode_chunk(q, k, v, kv_layout="bshd", **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_decode_chunk_quantized_and_lse():
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    B, S, T, H, Hk, D = 2, 256, 3, 4, 4, 64
    q = jax.random.normal(jax.random.PRNGKey(33), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(34), (B, S, Hk, D))
    v = jax.random.normal(jax.random.PRNGKey(35), (B, S, Hk, D))
    lens = jnp.asarray([256, 131], jnp.int32)
    kq, ks, vq, vs = quantize_kv(k, v, "int8")
    want, want_lse = flash_decode_chunk(
        q, kq, vq, k_scale=ks, v_scale=vs, kv_length=lens, kv_layout="bshd",
        use_kernel=False, return_lse=True, interpret=True,
    )
    got, lse = flash_decode_chunk(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
        k_scale=jnp.swapaxes(ks, 1, 2), v_scale=jnp.swapaxes(vs, 1, 2),
        kv_length=lens, kv_layout="bhsd", block_k=128, interpret=True,
        return_lse=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=2e-4, rtol=2e-4)


def test_decode_chunk_t1_matches_flash_decode():
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    q, k, v = setup(jax.random.PRNGKey(36), 2, 256, 4, 2, 64)
    lens = jnp.asarray([256, 77], jnp.int32)
    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    want = flash_decode(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                        block_k=128, interpret=True)
    got = flash_decode_chunk(q[:, None], kt, vt, kv_length=lens,
                             kv_layout="bhsd", block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_decode_clamped_softmax_matches_online():
    """softmax_mode='clamped' (no running max, base-2 exp2 clamp) must match
    the online-softmax kernel for in-contract scores: out and lse."""
    q, k, v = setup(jax.random.PRNGKey(40), 3, 384, 8, 2, 64)
    lens = jnp.asarray([384, 200, 1], jnp.int32)
    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    want, want_lse = flash_decode(
        q, kt, vt, kv_length=lens, kv_layout="bhsd", interpret=True,
        return_lse=True,
    )
    got, lse = flash_decode(
        q, kt, vt, kv_length=lens, kv_layout="bhsd", interpret=True,
        return_lse=True, softmax_mode="clamped",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=3e-4, rtol=3e-4)


def test_decode_clamped_quantized_and_chunk():
    """Clamped mode composes with int8 fused dequant, split-KV, and chunk
    decode (per-row causal limits)."""
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    q, k, v = setup(jax.random.PRNGKey(41), 2, 256, 4, 2, 64)
    kq, ks, vq, vs = quantize_kv(k, v, "int8")
    kt, vt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    kst, vst = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)
    lens = jnp.asarray([256, 130], jnp.int32)
    want = flash_decode(q, kt, vt, k_scale=kst, v_scale=vst, kv_length=lens,
                        kv_layout="bhsd", block_k=128, interpret=True)
    got = flash_decode(q, kt, vt, k_scale=kst, v_scale=vst, kv_length=lens,
                       kv_layout="bhsd", block_k=128, interpret=True,
                       num_splits=2, softmax_mode="clamped")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)

    qc = jax.random.normal(jax.random.PRNGKey(42), (2, 3, 4, 64))
    wantc = flash_decode_chunk(qc, kt, vt, k_scale=kst, v_scale=vst,
                               kv_length=lens, kv_layout="bhsd", block_k=128,
                               interpret=True)
    gotc = flash_decode_chunk(qc, kt, vt, k_scale=kst, v_scale=vst,
                              kv_length=lens, kv_layout="bhsd", block_k=128,
                              interpret=True, softmax_mode="clamped")
    np.testing.assert_allclose(np.asarray(gotc), np.asarray(wantc),
                               atol=3e-4, rtol=3e-4)


def test_decode_clamped_scores_above_ceiling_clamp_gracefully():
    """Scores past the base-2 ceiling saturate (tie toward uniform over the
    clamped entries) instead of producing inf/nan."""
    B, S, Hk, D = 1, 128, 2, 64
    q = jnp.full((B, 2, D), 12.0)  # logits ~ 12*12*64/8 = 1152 nats >> 55
    k = jnp.full((B, Hk, S, D), 12.0)
    v = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[None, None, :, None], (B, Hk, S, D)
    )
    out = flash_decode(q, k, v, kv_layout="bhsd", interpret=True,
                       softmax_mode="clamped")
    assert np.isfinite(np.asarray(out)).all()
    # every score clamps equally -> uniform attention -> mean of v rows
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], (S - 1) / 2.0, rtol=1e-3
    )


def test_decode_sliding_window():
    """window=W == full decode over only the last W cache positions
    (Mistral-style local attention at decode), kernel vs jnp oracle, with
    ragged lengths, GQA, and both softmax modes."""
    q, k, v = setup(jax.random.PRNGKey(50), 3, 384, 8, 2, 64)
    lens = jnp.asarray([384, 200, 60], jnp.int32)
    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    W = 100
    want = flash_decode(q, k, v, kv_length=lens, use_kernel=False,
                        interpret=True, window=W)
    for sm in ("online", "clamped"):
        got = flash_decode(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                           block_k=128, interpret=True, window=W,
                           softmax_mode=sm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)
    # window >= kv_len == no window at all
    full = flash_decode(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                        block_k=128, interpret=True)
    winbig = flash_decode(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                          block_k=128, interpret=True, window=4096)
    np.testing.assert_allclose(np.asarray(winbig), np.asarray(full),
                               atol=1e-6, rtol=1e-6)


def test_decode_chunk_sliding_window():
    """Chunk decode with a sliding window: per-row causal limit AND per-row
    window lower bound, kernel vs jnp oracle."""
    from flash_attn_tpu.ops.decode import flash_decode_chunk

    q = jax.random.normal(jax.random.PRNGKey(51), (2, 3, 4, 64))
    _, k, v = setup(jax.random.PRNGKey(52), 2, 256, 4, 2, 64)
    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    lens = jnp.asarray([256, 130], jnp.int32)
    W = 64
    want = flash_decode_chunk(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                              use_kernel=False, interpret=True, window=W)
    got = flash_decode_chunk(q, kt, vt, kv_length=lens, kv_layout="bhsd",
                             block_k=128, interpret=True, window=W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)


def test_decode_logit_softcap():
    """softcap in the BHSD decode kernel == capped full-attention oracle."""
    from flash_attn_tpu.ops.reference import mha_reference

    key = jax.random.PRNGKey(30)
    B, S, H, Hk, D = 2, 192, 4, 2, 32
    q = jax.random.normal(key, (B, H, D), jnp.float32) * 3.0
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, Hk, S, D),
                          jnp.float32) * 3.0
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, Hk, S, D),
                          jnp.float32)
    lens = jnp.asarray([150, 192], jnp.int32)
    got = flash_decode(
        q, k, v, kv_length=lens, kv_layout="bhsd", logit_softcap=20.0,
        interpret=True,
    )
    kc = jnp.swapaxes(k, 1, 2)
    vc = jnp.swapaxes(v, 1, 2)
    mask = (jnp.arange(S)[None] < lens[:, None])[:, None, None, :]
    want = mha_reference(
        q[:, None], kc, vc, mask=jnp.where(mask, 0.0, -jnp.inf),
        logit_softcap=20.0,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_paged_decode_logit_softcap():
    """softcap in the paged kernel == softcap in the contiguous decode."""
    from flash_attn_tpu.engine.paged import PagedKVPool
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode

    key = jax.random.PRNGKey(31)
    B, Hk, D = 2, 2, 32
    page, maxp = 8, 4
    S = page * maxp
    pool = PagedKVPool.create(1, 16, page, B, maxp, Hk, D, dtype=jnp.float32)
    pool = pool.assign_pages(0, [1, 2, 3, 4]).assign_pages(1, [5, 6, 7, 8])
    ks = jax.random.normal(key, (S, B, Hk, D)) * 2.0
    vs = jax.random.normal(jax.random.fold_in(key, 1), (S, B, Hk, D))
    for t in range(S):
        pool = pool.append_token(0, ks[t], vs[t]).advance(1)
    lens = [20, 31]
    pool = pool.set_lengths(lens)
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, 4, D)) * 2.0
    got = paged_flash_decode(
        q, pool.k_pages[0], pool.v_pages[0], pool.block_table, pool.length,
        logit_softcap=15.0, interpret=True,
    )
    want = flash_decode(
        q, jnp.swapaxes(ks, 0, 1), jnp.swapaxes(vs, 0, 1),
        kv_length=jnp.asarray(lens, jnp.int32), kv_layout="bshd",
        logit_softcap=15.0, use_kernel=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_decode_fp16():
    """fp16 q/cache through the decode kernel (flash_attn.h:31 dtype pair)."""
    q, k, v = setup(jax.random.PRNGKey(40), 2, 512, 4, 4, 64)
    q16, k16, v16 = (x.astype(jnp.float16) for x in (q, k, v))
    lens = jnp.asarray([300, 512], jnp.int32)
    got = flash_decode(
        q16, jnp.swapaxes(k16, 1, 2), jnp.swapaxes(v16, 1, 2),
        kv_length=lens, kv_layout="bhsd", interpret=True,
    )
    want = oracle(q16.astype(jnp.float32), k16.astype(jnp.float32),
                  v16.astype(jnp.float32), kv_length=lens)
    assert got.dtype == jnp.float16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-3, rtol=2e-3
    )
