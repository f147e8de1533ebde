"""Fused quantize+append kernel (ops/kv_append.py) and the lane-dense
KVCache scale layout it feeds (engine/kv_cache.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.ops.decode import (
    _depermute_scale_lanes,
    _permute_scale_lanes,
    flash_decode,
)
from flash_attn_tpu.ops.kv_append import kv_append_token
from flash_attn_tpu.ops.quant import quantize_kv


def _mk(key, b, hk, d):
    return jax.random.normal(key, (b, hk, d), jnp.bfloat16)


@pytest.mark.parametrize("mode", ["none", "int8", "fp8"])
def test_kv_append_token_matches_quantize_kv(mode):
    B, Hk, S, D = 3, 2, 64, 64
    cache = KVCache.create(1, B, S, Hk, D, mode=mode, scale_perm_chunk=None)
    nk = _mk(jax.random.PRNGKey(0), B, Hk, D)
    nv = _mk(jax.random.PRNGKey(1), B, Hk, D)
    length = jnp.asarray([0, 5, 37], jnp.int32)
    ksl = None if cache.k_scale is None else cache.k_scale[0]
    vsl = None if cache.v_scale is None else cache.v_scale[0]
    k2, v2, ks2, vs2 = kv_append_token(
        cache.k[0], cache.v[0], ksl, vsl, nk, nv, length, mode=mode,
        interpret=True,
    )
    # oracle: quantize_kv on [B, 1, Hk, D] then place by hand
    kq, ks, vq, vs = quantize_kv(nk[:, None], nv[:, None], mode)
    for b in range(B):
        p = int(length[b])
        np.testing.assert_array_equal(
            np.asarray(k2[b, :, p]).view(np.uint8),
            np.asarray(kq[b, 0].astype(k2.dtype)).view(np.uint8),
        )
        np.testing.assert_array_equal(
            np.asarray(v2[b, :, p]).view(np.uint8),
            np.asarray(vq[b, 0].astype(v2.dtype)).view(np.uint8),
        )
        if mode != "none":
            np.testing.assert_allclose(
                np.asarray(ks2[b, :, 0, p]), np.asarray(ks[b, 0, :, 0])
            )
            np.testing.assert_allclose(
                np.asarray(vs2[b, :, 0, p]), np.asarray(vs[b, 0, :, 0])
            )
        # untouched rows stay zero
        other = [i for i in range(S) if i != p]
        assert np.abs(np.asarray(k2[b, :, other].astype(jnp.float32))).max() == 0


def test_kv_append_token_permuted_scale_lanes():
    """fp8 append with pre-permuted scale storage: the written lane is the
    packed-decode image of the natural position."""
    B, Hk, S, D, chunk = 2, 2, 64, 64, 16
    cache = KVCache.create(1, B, S, Hk, D, mode="fp8", scale_perm_chunk=chunk)
    nk = _mk(jax.random.PRNGKey(2), B, Hk, D)
    nv = _mk(jax.random.PRNGKey(3), B, Hk, D)
    length = jnp.asarray([3, 40], jnp.int32)
    k2, v2, ks2, vs2 = kv_append_token(
        cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
        nk, nv, length, mode="fp8", scale_perm_chunk=chunk, interpret=True,
    )
    _, ks, _, _ = quantize_kv(nk[:, None], nv[:, None], "fp8")
    nat = np.asarray(_depermute_scale_lanes(ks2, chunk))
    for b in range(B):
        p = int(length[b])
        np.testing.assert_allclose(nat[b, :, 0, p], np.asarray(ks[b, 0, :, 0]))


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_cache_append_token_vs_chunk_path(mode):
    """T==1 fused-kernel appends build the same cache (values, scales,
    decode output) as the T>1 DUS/scatter path."""
    B, Hk, H, S, D, T = 2, 2, 4, 64, 64, 6
    new_k = jax.random.normal(jax.random.PRNGKey(4), (B, T, Hk, D), jnp.bfloat16)
    new_v = jax.random.normal(jax.random.PRNGKey(5), (B, T, Hk, D), jnp.bfloat16)

    c1 = KVCache.create(1, B, S, Hk, D, mode=mode)
    for t in range(T):
        c1 = c1.append(0, new_k[:, t : t + 1], new_v[:, t : t + 1]).advance(1)
    c2 = KVCache.create(1, B, S, Hk, D, mode=mode)
    c2 = c2.append(0, new_k, new_v).advance(T)

    np.testing.assert_array_equal(
        np.asarray(c1.k[0]).view(np.uint8), np.asarray(c2.k[0]).view(np.uint8)
    )
    np.testing.assert_array_equal(
        np.asarray(c1.v[0]).view(np.uint8), np.asarray(c2.v[0]).view(np.uint8)
    )
    # scales agree on the T live lanes
    lanes = np.asarray(c1._scale_lane(jnp.arange(T)))
    np.testing.assert_allclose(
        np.asarray(c1.k_scale[0])[:, :, :, lanes],
        np.asarray(c2.k_scale[0])[:, :, :, lanes],
    )

    q = jax.random.normal(jax.random.PRNGKey(6), (B, H, D), jnp.bfloat16)
    kc, vc, ks, vs = c1.layer(0)
    o1 = flash_decode(q, kc, vc, k_scale=ks, v_scale=vs, kv_length=c1.length,
                      kv_layout="bhsd", interpret=True, **c1.scale_args())
    kc, vc, ks, vs = c2.layer(0)
    o2 = flash_decode(q, kc, vc, k_scale=ks, v_scale=vs, kv_length=c2.length,
                      kv_layout="bhsd", interpret=True, **c2.scale_args())
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_lanes_scale_layout_matches_kv_layout():
    """flash_decode(scale_layout='lanes'[, perm]) == the same cache content
    through the legacy broadcastable layout."""
    B, Hk, H, S, D, chunk = 2, 2, 4, 64, 64, 16
    k = jax.random.normal(jax.random.PRNGKey(7), (B, S, Hk, D))
    v = jax.random.normal(jax.random.PRNGKey(8), (B, S, Hk, D))
    kq, ks, vq, vs = quantize_kv(k, v, "fp8")  # ks [B, S, Hk, 1]
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H, D), jnp.bfloat16)
    lens = jnp.asarray([50, 64], jnp.int32)

    kqb, vqb = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    ksb, vsb = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)  # [B,Hk,S,1]
    want = flash_decode(q, kqb, vqb, k_scale=ksb, v_scale=vsb,
                        kv_length=lens, kv_layout="bhsd", interpret=True)

    lanes_ks = jnp.swapaxes(ksb, 2, 3)  # [B, Hk, 1, S]
    lanes_vs = jnp.swapaxes(vsb, 2, 3)
    got = flash_decode(q, kqb, vqb, k_scale=lanes_ks, v_scale=lanes_vs,
                       kv_length=lens, kv_layout="bhsd", interpret=True,
                       scale_layout="lanes")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    perm_ks = _permute_scale_lanes(lanes_ks, chunk)
    perm_vs = _permute_scale_lanes(lanes_vs, chunk)
    got_p = flash_decode(q, kqb, vqb, k_scale=perm_ks, v_scale=perm_vs,
                         kv_length=lens, kv_layout="bhsd", interpret=True,
                         scale_layout="lanes", scales_perm_chunk=chunk)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want), atol=1e-6)


def test_insert_at_and_slot_kv_float_permuted():
    """Chunked-prefill write/read round-trips through the permuted lane
    store: slot_kv_float dequantizes back to ~the inserted values."""
    B, Hk, S, D, T, chunk = 2, 2, 64, 64, 10, 16
    cache = KVCache.create(1, B, S, Hk, D, mode="fp8", scale_perm_chunk=chunk)
    nk = jax.random.normal(jax.random.PRNGKey(10), (T, Hk, D), jnp.bfloat16)
    nv = jax.random.normal(jax.random.PRNGKey(11), (T, Hk, D), jnp.bfloat16)
    cache = cache.insert_at(0, 1, nk, nv, 4)
    kf, vf = cache.slot_kv_float(0, 1)  # [1, S, Hk, D]
    np.testing.assert_allclose(
        np.asarray(kf[0, 4 : 4 + T], np.float32),
        np.asarray(nk, np.float32), atol=0.1, rtol=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(vf[0, 4 : 4 + T], np.float32),
        np.asarray(nv, np.float32), atol=0.1, rtol=0.1,
    )
