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
