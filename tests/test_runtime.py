"""Native runtime: build libfatpu.so, exercise the C ABI boundary (error
subsystem parity with flash_attn.h:136-138, executor dispatch, page pool)."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.runtime import abi


@pytest.fixture(scope="module")
def lib():
    if not abi.build_native():
        pytest.skip("no C++ toolchain available")
    return abi.load()


def test_version_and_error_subsystem(lib):
    assert lib.fatpu_version().decode().startswith("fatpu-")
    lib.fatpu_set_error(b"boom")
    assert lib.fatpu_last_error() == b"boom"
    lib.fatpu_set_error(b"")
    assert lib.fatpu_last_error() == b""


def test_unregistered_executor_fails_cleanly(lib):
    # valid args but no executor for kind 2 (bwd) unless registered: use a
    # fresh struct and ensure bool-false + message, not a crash.
    call = abi.FatpuAttnCall()
    call.struct_size = ctypes.sizeof(abi.FatpuAttnCall)
    ok = lib.fatpu_attn_fwd(ctypes.byref(call))
    assert not ok
    assert b"null q/k/v" in lib.fatpu_last_error()


def test_validation_errors(lib):
    call = abi.FatpuAttnCall()
    call.struct_size = 8  # too small -> version mismatch detected
    assert not lib.fatpu_attn_fwd(ctypes.byref(call))
    assert b"struct_size" in lib.fatpu_last_error()


def test_c_abi_fwd_through_jax_executor(lib):
    """A host framework fills the struct with numpy buffers and gets flash
    attention back — the full reference consumption pattern
    (flash_attn.h:10-36) in TPU-native form."""
    abi.register_jax_executor()
    B, S, H, D = 1, 64, 2, 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, S, H, D), np.float32)
    k = rng.standard_normal((B, S, H, D), np.float32)
    v = rng.standard_normal((B, S, H, D), np.float32)
    out = np.zeros_like(q)
    lse = np.zeros((B, H, S), np.float32)

    call = abi.FatpuAttnCall()
    call.struct_size = ctypes.sizeof(abi.FatpuAttnCall)
    call.q = q.ctypes.data
    call.k = k.ctypes.data
    call.v = v.ctypes.data
    call.out = out.ctypes.data
    call.lse = lse.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    call.batch, call.seqlen_q, call.seqlen_k = B, S, S
    call.num_heads = call.num_heads_k = H
    call.head_dim = D
    call.dtype = 0  # f32
    call.is_causal = True

    ok = lib.fatpu_attn_fwd(ctypes.byref(call))
    assert ok, lib.fatpu_last_error()

    from flash_attn_tpu.ops.reference import mha_reference

    want, want_lse = mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
        return_lse=True,
    )
    np.testing.assert_allclose(out, np.asarray(want), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(lse, np.asarray(want_lse), atol=1e-3, rtol=1e-3)


def _fill_common(call, q, k, v, out):
    call.struct_size = ctypes.sizeof(abi.FatpuAttnCall)
    call.q, call.k, call.v = q.ctypes.data, k.ctypes.data, v.ctypes.data
    call.out = out.ctypes.data
    call.head_dim = q.shape[-1]
    call.num_heads, call.num_heads_k = q.shape[-2], k.shape[-2]
    call.dtype = 0  # f32


def test_c_abi_varlen_fwd_with_mask(lib):
    """Varlen C entry point with a packed-axis additive mask — the
    attn_mask/mask_dims contract of flash_attn_varlen_fwd
    (flash_attn.h:65-66) must actually reach the kernel."""
    abi.register_jax_executor()
    H, D = 2, 32
    lens = [24, 40, 16]
    total = sum(lens)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((total, H, D), np.float32)
    k = rng.standard_normal((total, H, D), np.float32)
    v = rng.standard_normal((total, H, D), np.float32)
    mask = (rng.standard_normal((total, total)) * 2).astype(np.float32)
    cu = np.zeros(len(lens) + 1, np.int32)
    cu[1:] = np.cumsum(lens)
    out = np.zeros_like(q)
    lse = np.zeros((H, total), np.float32)

    call = abi.FatpuAttnCall()
    _fill_common(call, q, k, v, out)
    call.lse = lse.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    call.attn_mask = mask.ctypes.data
    dims = (ctypes.c_int64 * 2)(total, total)
    call.mask_dims = dims
    call.mask_ndim = 2
    call.cu_seqlens_q = cu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    call.cu_seqlens_k = cu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    call.batch = len(lens)
    call.total_q = call.total_k = total
    call.is_causal = True
    ok = lib.fatpu_attn_varlen_fwd(ctypes.byref(call))
    assert ok, lib.fatpu_last_error()

    from flash_attn_tpu.ops.attention import flash_attention_varlen

    want, want_lse = flash_attention_varlen(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(cu), jnp.asarray(cu), causal=True,
        mask=jnp.asarray(mask), return_lse=True,
    )
    np.testing.assert_allclose(out, np.asarray(want), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(lse, np.asarray(want_lse), atol=1e-3, rtol=1e-3)
    # the mask must have had an effect (regression for the silently-dropped
    # mask bug): rerun without it and require a different output
    call.attn_mask = 0
    out2 = np.zeros_like(q)
    call.out = out2.ctypes.data
    assert lib.fatpu_attn_varlen_fwd(ctypes.byref(call))
    assert not np.allclose(out, out2, atol=1e-3)


def test_c_abi_varlen_bwd_round_trip(lib):
    """fwd then bwd through the C path on a packed ragged batch ≙
    flash_attn_varlen_bwd (flash_attn.h:101-134); grads vs jax.grad of the
    varlen API."""
    abi.register_jax_executor()
    H, D = 2, 32
    lens = [24, 40]
    total = sum(lens)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((total, H, D), np.float32)
    k = rng.standard_normal((total, H, D), np.float32)
    v = rng.standard_normal((total, H, D), np.float32)
    dout = rng.standard_normal((total, H, D), np.float32)
    cu = np.zeros(len(lens) + 1, np.int32)
    cu[1:] = np.cumsum(lens)
    out = np.zeros_like(q)
    lse = np.zeros((H, total), np.float32)

    call = abi.FatpuAttnCall()
    _fill_common(call, q, k, v, out)
    call.lse = lse.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    call.cu_seqlens_q = cu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    call.cu_seqlens_k = cu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    call.batch = len(lens)
    call.total_q = call.total_k = total
    call.is_causal = True
    assert lib.fatpu_attn_varlen_fwd(ctypes.byref(call)), lib.fatpu_last_error()

    dq = np.zeros_like(q)
    dk = np.zeros_like(k)
    dv = np.zeros_like(v)
    call.dout = dout.ctypes.data
    call.dq, call.dk, call.dv = dq.ctypes.data, dk.ctypes.data, dv.ctypes.data
    call.lse_in = lse.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    assert lib.fatpu_attn_varlen_bwd(ctypes.byref(call)), lib.fatpu_last_error()

    from flash_attn_tpu.ops.attention import flash_attention_varlen

    def loss(q_, k_, v_):
        o = flash_attention_varlen(
            q_, k_, v_, jnp.asarray(cu), jnp.asarray(cu), causal=True
        )
        return jnp.sum(o * jnp.asarray(dout))

    wq, wk, wv = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(dq, np.asarray(wq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(dk, np.asarray(wk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(dv, np.asarray(wv), atol=5e-4, rtol=5e-4)


def test_page_pool_lifecycle(lib):
    pool = abi.PagePool(16)
    assert pool.free_count == 15  # page 0 reserved
    a = pool.acquire(slot=3, n=4)
    assert len(a) == 4 and 0 not in a
    assert pool.free_count == 11
    assert pool.owner(a[0]) == 3
    b = pool.acquire(slot=5, n=11)
    assert len(b) == 11
    assert pool.acquire(slot=6, n=1) is None  # exhausted -> no partial alloc
    assert pool.release_slot(3) == 4
    assert pool.free_count == 4
    c = pool.acquire(slot=6, n=2)
    assert len(c) == 2


def test_page_pool_no_partial_allocation(lib):
    pool = abi.PagePool(8)
    assert pool.acquire(0, 7) is not None
    before = pool.free_count
    assert pool.acquire(1, 3) is None
    assert pool.free_count == before
