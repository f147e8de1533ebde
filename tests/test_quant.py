"""Quantization ops + weight-only matmul kernels vs dequantize-then-float
oracles (SURVEY.md §4 obligation 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.matmul import matmul_int4, matmul_int8, quantized_matmul
from flash_attn_tpu.ops.quant import (
    dequantize,
    dequantize_int4,
    quantize_fp8,
    quantize_int4,
    quantize_int8,
    quantize_kv,
    unpack_int4,
)


def test_int8_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
    vals, scale = quantize_int8(x)
    xr = dequantize(vals, scale)
    # worst-case quantization error is scale/2 per element
    err = np.abs(np.asarray(xr - x))
    bound = np.broadcast_to(np.asarray(scale) / 2, x.shape) + 1e-7
    assert np.all(err <= bound)


def test_fp8_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 128))
    vals, scale = quantize_fp8(x)
    assert vals.dtype == jnp.float8_e4m3fn
    xr = dequantize(vals, scale)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=0.1, rtol=0.1)


def test_int4_pack_unpack_exact():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128))
    # absmax scales: the round-trip error bound below only holds unclipped
    qw = quantize_int4(w, group_size=128, clip_search=False)
    assert qw.packed.shape == (128, 128)
    assert qw.scales.shape == (2, 128)
    # unpack∘pack == the quantized integer grid exactly
    vals = unpack_int4(qw.packed, 128)
    assert vals.shape == (256, 128)
    assert np.asarray(vals).min() >= -8 and np.asarray(vals).max() <= 7
    wr = dequantize_int4(qw)
    err = np.abs(np.asarray(wr - w))
    scales_full = np.repeat(np.asarray(qw.scales), 128, axis=0)
    assert np.all(err <= scales_full / 2 + 1e-7)


def test_int4_clip_search_reduces_mse():
    """MSE-optimal clipping (quantize_int4 clip_search) never loses to the
    plain absmax scale, and typically wins."""
    from flash_attn_tpu.ops.quant import dequantize_int4

    w = jax.random.normal(jax.random.PRNGKey(12), (512, 256))
    mse_plain = float(
        jnp.mean(
            jnp.square(dequantize_int4(
                quantize_int4(w, clip_search=False)) - w)
        )
    )
    mse_clip = float(
        jnp.mean(
            jnp.square(dequantize_int4(
                quantize_int4(w, clip_search=True)) - w)
        )
    )
    assert mse_clip <= mse_plain * 1.0000001
    assert mse_clip < mse_plain * 0.95  # a real win on gaussian weights


def test_matmul_int4_group64_vs_oracle():
    """group_size=64 (the unrolled per-group kernel path — Mosaic cannot
    lane-split g<128) matches the dequantize-then-float oracle."""
    from flash_attn_tpu.ops.matmul import quantized_matmul
    from flash_attn_tpu.ops.quant import dequantize_int4

    x = jax.random.normal(jax.random.PRNGKey(13), (16, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(14), (256, 192), jnp.float32)
    qw = quantize_int4(w, group_size=64)
    got = quantized_matmul(x, qw, out_dtype=jnp.float32, interpret=True)
    want = jnp.dot(x, dequantize_int4(qw, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("scales_kind", ["per_col", "per_group"])
def test_matmul_int8_vs_oracle(scales_kind):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (32, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 192), jnp.float32)
    if scales_kind == "per_col":
        vals, scale = quantize_int8(w, axes=(0,))
        scales = scale[0]  # [N]
    else:
        wg = w.reshape(2, 128, 192)
        amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        vals = jnp.clip(jnp.round(wg / scale), -127, 127).astype(jnp.int8).reshape(256, 192)
        scales = scale[:, 0, :]  # [K//g, N]
    got = matmul_int8(x, vals, scales, interpret=True)
    want = x @ dequantize(
        vals, scales[None, :] if scales.ndim == 1 else jnp.repeat(scales, 128, axis=0)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_matmul_int4_vs_oracle():
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 512), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (512, 256), jnp.float32)
    qw = quantize_int4(w, group_size=128)
    got = matmul_int4(x, qw, interpret=True)
    want = x @ dequantize_int4(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_matmul_int4_w4a8_odd_group_multiple_K():
    """Default block_k must divide K even when K is an odd multiple of the
    group size (e.g. K=1536 = 12*128: min(1024, K) does not divide).  The
    default shrinks to the largest valid divisor; explicit bad block_k
    still raises."""
    import pytest

    from flash_attn_tpu.ops.matmul import W4A8Weight, matmul_w4a8

    K, N, g = 1536, 256, 128
    x = jax.random.normal(jax.random.PRNGKey(11), (8, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(12), (K, N), jnp.float32) * 0.02
    qw = quantize_int4(w, group_size=g)  # auto layout (planes at g=128)
    got = matmul_int4(x, qw, interpret=True)
    want = x @ dequantize_int4(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    qh = quantize_int4(w, group_size=g, layout="halves")
    w48 = W4A8Weight(qh.packed, qh.scales, qh.group_size, qh.shape)
    got48 = matmul_w4a8(x, w48, interpret=True)
    err = np.abs(np.asarray(got48) - np.asarray(want))
    assert err.max() / np.abs(np.asarray(want)).max() < 0.02
    with pytest.raises(ValueError):
        matmul_int4(x, qw, block_k=1024, interpret=True)


def test_quantized_matmul_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), (256, 128), jnp.float32)
    out_f = quantized_matmul(x, w)
    qw = quantize_int4(w)
    out_4 = quantized_matmul(x, qw, interpret=True)
    vals, scale = quantize_int8(w, axes=(0,))
    out_8 = quantized_matmul(x, (vals, scale[0]), interpret=True)
    # int8 closer to float than int4
    e8 = float(jnp.mean(jnp.abs(out_8 - out_f)))
    e4 = float(jnp.mean(jnp.abs(out_4 - out_f)))
    assert e8 < e4 < 3.0


def test_quantize_kv_modes():
    k = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 4, 64))
    v = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 4, 64))
    for mode, dt in [("int8", jnp.int8), ("fp8", jnp.float8_e4m3fn)]:
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        assert kq.dtype == dt
        assert ks.shape == (2, 16, 4, 1)
        np.testing.assert_allclose(
            np.asarray(dequantize(kq, ks)), np.asarray(k), atol=0.1, rtol=0.2
        )
    kq, ks, vq, vs = quantize_kv(k, v, "none")
    assert kq is k and ks is None


def test_matmul_w8a8_matches_oracle():
    """W8A8 (int8 activations x int8 weights, int32 MXU accumulation) vs
    dequantize-then-float oracle; tolerance covers activation-quant noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.ops.matmul import matmul_w8a8, quantize_activations
    from flash_attn_tpu.ops.quant import quantize_int8

    M, K, N = 16, 256, 384
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    wq, wscale = quantize_int8(w, axes=(0,))

    got = matmul_w8a8(x, wq, wscale[0], interpret=True)

    # exact oracle on the quantized values: both paths see the same ints
    xq, sx = quantize_activations(x)
    want = (
        (xq.astype(jnp.float32) @ wq.astype(jnp.float32))
        * sx * wscale[0][None, :].reshape(1, N)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # and close to the float product (quant noise bound)
    full = x @ (wq.astype(jnp.float32) * wscale)
    err = np.abs(np.asarray(got) - np.asarray(full))
    assert err.max() / np.abs(np.asarray(full)).max() < 0.02


def test_llama_w8a8_mode():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.models import llama as ll

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    base = ll.forward(params, toks, cfg, interpret=True)
    qp = ll.quantize_weights(params, mode="w8a8")
    got = ll.forward(qp, toks, cfg, interpret=True)
    # logits stay well-correlated under int8 weight+activation quant
    c = np.corrcoef(np.asarray(base).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.999, c


def test_matmul_w4a8_matches_oracle():
    """W4A8 (int8 activations x packed-int4 weights decoded to int8 nibble
    planes, s8 x s8 MXU) vs the exact integer oracle and the dequant-float
    oracle.  Exercises multi-group blocks (gpb > 1) and the halves-layout
    plane pairing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.ops.matmul import (
        W4A8Weight, matmul_w4a8, quantize_activations, quantized_matmul,
    )
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    M, K, N, g = 16, 512, 384, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.02
    q4 = quantize_int4(w, group_size=g, layout="halves")
    w48 = W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)

    got = matmul_w4a8(x, w48, interpret=True)

    # exact oracle on the quantized values: both paths see the same ints
    xq, sx = quantize_activations(x)
    want = (xq.astype(jnp.float32) @ dequantize_int4(q4)) * sx
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # close to the float-x product (activation-quant noise bound)
    full = x @ dequantize_int4(q4)
    err = np.abs(np.asarray(got) - np.asarray(full))
    assert err.max() / np.abs(np.asarray(full)).max() < 0.02
    # dispatch: quantized_matmul routes W4A8Weight here
    got2 = quantized_matmul(x, w48, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               atol=1e-6, rtol=1e-6)


def test_matmul_w4a8_prefill_blocks():
    """Prefill-shaped w4a8 (M=128): the VMEM budget path sheds groups per
    k-block (block_k 2048 -> smaller) instead of only shrinking bn; the
    result must stay exact vs the integer oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.ops.matmul import (
        W4A8Weight, matmul_w4a8, quantize_activations,
    )
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    M, K, N, g = 128, 2048, 1024, 128
    x = jax.random.normal(jax.random.PRNGKey(3), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (K, N), jnp.float32) * 0.02
    q4 = quantize_int4(w, group_size=g, layout="halves")
    w48 = W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)
    got = matmul_w4a8(x, w48, interpret=True)
    xq, sx = quantize_activations(x)
    want = (xq.astype(jnp.float32) @ dequantize_int4(q4)) * sx
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_int4_w4a8_prefill_route_weight_only():
    """M >= 512 routes both packed-int4 matmuls through dequantize-then-
    bf16-dot (compute-bound regime): results equal the weight-only dequant
    oracle exactly — w4a8's activation quant applies only at decode
    shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.ops.matmul import (
        W4A8Weight, matmul_int4, matmul_w4a8,
    )
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    M, K, N, g = 512, 256, 256, 64
    x = jax.random.normal(jax.random.PRNGKey(5), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (K, N), jnp.float32) * 0.02
    q4 = quantize_int4(w, group_size=g, layout="halves")
    want = x @ dequantize_int4(q4)
    got_i4 = matmul_int4(x, q4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_i4), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    w48 = W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)
    got_48 = matmul_w4a8(x, w48, interpret=True)
    np.testing.assert_allclose(np.asarray(got_48), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # planes layout dequantizes identically through the strided-slice path
    q4p = quantize_int4(w, group_size=128)
    assert q4p.layout == "planes"
    got_p = matmul_int4(x, q4p, interpret=True)
    want_p = x @ dequantize_int4(q4p)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=1e-4, rtol=1e-4)


def test_llama_w4a8_mode_and_tp():
    """llama quantize_weights(mode='w4a8'): forward stays correlated with
    float, fused projections stay exact vs unfused, and the tree shards
    under TP (BASELINE config 4 serving mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.models import llama as ll
    from flash_attn_tpu.ops.matmul import W4A8Weight
    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.tp import shard_params_quant

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    base = ll.forward(params, toks, cfg, interpret=True)
    qp = ll.quantize_weights(params, mode="w4a8", group_size=32)
    assert isinstance(qp["blocks"][0]["wq"], W4A8Weight)
    got = ll.forward(qp, toks, cfg, interpret=True)
    c = np.corrcoef(np.asarray(base).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.98, c  # int4 weight noise bound (same as mode='int4')
    # vs mode='int4' (identical nibbles+scales, halves layout): the only
    # difference is per-token int8 activation quant — near-identical logits
    qp4 = ll.quantize_weights(params, mode="int4", group_size=32)
    got4 = ll.forward(qp4, toks, cfg, interpret=True)
    c48 = np.corrcoef(np.asarray(got4).ravel(), np.asarray(got).ravel())[0, 1]
    assert c48 > 0.999, c48

    # fused projections exact vs unfused
    pf = ll.fuse_projections(qp)
    got_f = ll.forward(pf, toks, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(got, np.float32),
                               atol=1e-4, rtol=1e-4)

    # TP shard: logits match unsharded
    mesh = make_mesh(MeshConfig(tp=2))
    sharded = shard_params_quant(qp, mesh)
    got_tp = jax.jit(
        lambda p: ll.forward(p, toks, cfg, interpret=True)
    )(sharded)
    np.testing.assert_allclose(np.asarray(got_tp, np.float32),
                               np.asarray(got, np.float32),
                               atol=2e-3, rtol=2e-3)


def test_int4_plane_layout_roundtrip_and_matmul():
    """The "planes" packing (whole-i32-word mantissa-OR decode,
    ops/matmul._int4_plane_kernel) dequantizes bitwise-identically to the
    halves layout and its matmul matches the dequant oracle; auto layout
    picks planes when group_size % 128 == 0."""
    import numpy as np
    from flash_attn_tpu.ops.matmul import quantized_matmul
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((512, 384)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    for g in (128, 256):
        wp = quantize_int4(w, group_size=g)
        assert wp.layout == "planes"
        wh = quantize_int4(w, group_size=g, layout="halves")
        np.testing.assert_array_equal(
            np.asarray(dequantize_int4(wp)), np.asarray(dequantize_int4(wh))
        )
        got = quantized_matmul(x, wp, out_dtype=jnp.float32, interpret=True)
        want = jnp.dot(x, dequantize_int4(wp))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )
    assert quantize_int4(w, group_size=64).layout == "halves"
