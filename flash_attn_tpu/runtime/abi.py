"""ctypes binding to the native fatpu runtime (libfatpu.so).

Two pieces:
- the C-ABI attention boundary (fatpu_attn_* entry points) with a JAX
  executor registered from here: a host framework can dlopen libfatpu.so,
  fill a fatpu_attn_call struct, and get TPU flash attention back in its
  output buffers — role parity with how Paddle consumed flash_attn.h;
- the native page allocator (PagePool) used by the engine's scheduler.

The library builds with `make -C flash_attn_tpu/runtime/native` (plain g++,
no external deps); everything here degrades gracefully when the .so is
absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from ctypes import (
    POINTER,
    c_bool,
    c_char_p,
    c_float,
    c_int32,
    c_size_t,
    c_uint64,
    c_void_p,
)

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfatpu.so")

_lib = None
_keepalive = []  # registered CFUNCTYPE objects must outlive the library


class FatpuAttnCall(ctypes.Structure):
    _fields_ = [
        ("struct_size", c_size_t),
        ("q", c_void_p),
        ("k", c_void_p),
        ("v", c_void_p),
        ("out", c_void_p),
        ("lse", POINTER(c_float)),
        ("attn_mask", c_void_p),
        ("mask_dims", ctypes.POINTER(ctypes.c_int64)),
        ("mask_ndim", c_int32),
        ("cu_seqlens_q", POINTER(c_int32)),
        ("cu_seqlens_k", POINTER(c_int32)),
        ("batch", c_int32),
        ("seqlen_q", c_int32),
        ("seqlen_k", c_int32),
        ("total_q", c_int32),
        ("total_k", c_int32),
        ("num_heads", c_int32),
        ("num_heads_k", c_int32),
        ("head_dim", c_int32),
        ("dtype", c_int32),
        ("softmax_scale", c_float),
        ("dropout_rate", c_float),
        ("dropout_seed", c_uint64),
        ("is_causal", c_bool),
        ("dout", c_void_p),
        ("dq", c_void_p),
        ("dk", c_void_p),
        ("dv", c_void_p),
        ("lse_in", POINTER(c_float)),
    ]


EXECUTOR_FN = ctypes.CFUNCTYPE(c_bool, POINTER(FatpuAttnCall))

DTYPE_MAP = {0: np.float32, 1: "bfloat16", 2: np.float16}


def build_native(force=False) -> bool:
    """Compile libfatpu.so with the in-tree Makefile."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load(build_if_missing=True):
    """dlopen the native library (building it first if needed)."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and build_native()):
            raise OSError(f"libfatpu.so not found at {_LIB_PATH}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fatpu_last_error.restype = c_char_p
    lib.fatpu_version.restype = c_char_p
    lib.fatpu_set_error.argtypes = [c_char_p]
    lib.fatpu_register_executor.restype = EXECUTOR_FN
    lib.fatpu_register_executor.argtypes = [c_int32, EXECUTOR_FN]
    for name in ("fatpu_attn_fwd", "fatpu_attn_varlen_fwd",
                 "fatpu_attn_bwd", "fatpu_attn_varlen_bwd"):
        fn = getattr(lib, name)
        fn.restype = c_bool
        fn.argtypes = [POINTER(FatpuAttnCall)]
    lib.fatpu_pool_create.restype = c_void_p
    lib.fatpu_pool_create.argtypes = [c_int32]
    lib.fatpu_pool_destroy.argtypes = [c_void_p]
    lib.fatpu_pool_free_count.restype = c_int32
    lib.fatpu_pool_free_count.argtypes = [c_void_p]
    lib.fatpu_pool_acquire.restype = c_int32
    lib.fatpu_pool_acquire.argtypes = [c_void_p, c_int32, c_int32, POINTER(c_int32)]
    lib.fatpu_pool_release_slot.restype = c_int32
    lib.fatpu_pool_release_slot.argtypes = [c_void_p, c_int32]
    lib.fatpu_pool_owner.restype = c_int32
    lib.fatpu_pool_owner.argtypes = [c_void_p, c_int32]
    lib.fatpu_pool_transfer.restype = c_int32
    lib.fatpu_pool_transfer.argtypes = [
        c_void_p, POINTER(c_int32), c_int32, c_int32
    ]
    lib.fatpu_pool_release_pages.restype = c_int32
    lib.fatpu_pool_release_pages.argtypes = [
        c_void_p, POINTER(c_int32), c_int32
    ]
    _lib = lib
    return lib


def _np_from(ptr, shape, dtype):
    import ml_dtypes

    dt = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)
    n = int(np.prod(shape))
    buf = (ctypes.c_char * (n * dt.itemsize)).from_address(ptr)
    return np.frombuffer(buf, dtype=dt).reshape(shape)


def _jax_executor(call_ptr, *, varlen: bool, backward: bool) -> bool:
    """The registered executor: unpack the C struct, run the JAX kernels,
    write results into the caller's buffers."""
    import jax.numpy as jnp

    from flash_attn_tpu.ops.attention import flash_attention, flash_attention_varlen
    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import flash_fwd

    lib = _lib
    try:
        c = call_ptr.contents
        dtype = DTYPE_MAP.get(c.dtype)
        if dtype is None:
            lib.fatpu_set_error(b"unsupported dtype for host-buffer path")
            return False
        d = c.head_dim
        scale = c.softmax_scale if c.softmax_scale != 0.0 else None
        if varlen:
            qs = (c.total_q, c.num_heads, d)
            ks = (c.total_k, c.num_heads_k, d)
        else:
            qs = (c.batch, c.seqlen_q, c.num_heads, d)
            ks = (c.batch, c.seqlen_k, c.num_heads_k, d)
        q = jnp.asarray(_np_from(c.q, qs, dtype))
        k = jnp.asarray(_np_from(c.k, ks, dtype))
        v = jnp.asarray(_np_from(c.v, ks, dtype))

        mask = None
        if c.attn_mask:
            dims = tuple(c.mask_dims[i] for i in range(c.mask_ndim))
            mask = jnp.asarray(_np_from(c.attn_mask, dims, np.float32))

        if not backward:
            if varlen:
                cu_q = np.ctypeslib.as_array(c.cu_seqlens_q, (c.batch + 1,))
                cu_k = np.ctypeslib.as_array(c.cu_seqlens_k, (c.batch + 1,))
                # mask over packed token axes (flash_attn.h:65-66):
                # [total_q, total_k] or [H, total_q, total_k]
                out, lse = flash_attention_varlen(
                    q, k, v, jnp.asarray(cu_q), jnp.asarray(cu_k),
                    causal=c.is_causal, mask=mask, scale=scale,
                    dropout_rate=c.dropout_rate, dropout_seed=int(c.dropout_seed),
                    return_lse=True,
                )
                lse_shape = (c.num_heads, c.total_q)
            else:
                out, lse = flash_fwd(
                    q, k, v, bias=mask, causal=c.is_causal, scale=scale,
                    dropout_rate=c.dropout_rate, dropout_seed=int(c.dropout_seed),
                )
                lse_shape = (c.batch, c.num_heads, c.seqlen_q)
            _np_from(c.out, qs, dtype)[...] = np.asarray(out)
            if c.lse:
                np.ctypeslib.as_array(c.lse, lse_shape)[...] = np.asarray(lse)
            return True

        # backward
        dout = jnp.asarray(_np_from(c.dout, qs, dtype))
        out_arr = jnp.asarray(_np_from(c.out, qs, dtype))
        if varlen:
            # ≙ flash_attn_varlen_bwd (flash_attn.h:101-134): cu_seqlens →
            # segment ids + per-sequence causal positions at this edge, then
            # the same Pallas backward as the dense path on a singleton batch.
            from flash_attn_tpu.ops.attention import varlen_segments

            cu_q = np.ctypeslib.as_array(c.cu_seqlens_q, (c.batch + 1,))
            cu_k = np.ctypeslib.as_array(c.cu_seqlens_k, (c.batch + 1,))
            qseg, kseg, qpos, kpos, causal = varlen_segments(
                jnp.asarray(cu_q), jnp.asarray(cu_k),
                int(c.total_q), int(c.total_k), bool(c.is_causal),
            )
            lse_in = jnp.asarray(
                np.ctypeslib.as_array(c.lse_in, (c.num_heads, c.total_q))
            )[None]
            if mask is not None:
                mask = mask[None, None] if mask.ndim == 2 else mask[None]
            dq, dk, dv = flash_bwd(
                q[None], k[None], v[None], out_arr[None], lse_in, dout[None],
                bias=mask, q_segment_ids=qseg, kv_segment_ids=kseg,
                q_positions=qpos, kv_positions=kpos, causal=causal,
                scale=scale, dropout_rate=c.dropout_rate,
                dropout_seed=int(c.dropout_seed),
            )
            dq, dk, dv = dq[0], dk[0], dv[0]
        else:
            lse_in = jnp.asarray(
                np.ctypeslib.as_array(
                    c.lse_in, (c.batch, c.num_heads, c.seqlen_q)
                )
            )
            dq, dk, dv = flash_bwd(
                q, k, v, out_arr, lse_in, dout, bias=mask, causal=c.is_causal,
                scale=scale, dropout_rate=c.dropout_rate,
                dropout_seed=int(c.dropout_seed),
            )
        _np_from(c.dq, qs, dtype)[...] = np.asarray(dq)
        _np_from(c.dk, ks, dtype)[...] = np.asarray(dk)
        _np_from(c.dv, ks, dtype)[...] = np.asarray(dv)
        return True
    except Exception as e:  # noqa: BLE001 — C boundary: no exceptions across
        lib.fatpu_set_error(repr(e).encode()[:512])
        return False


def register_jax_executor():
    """Install the JAX runtime behind all four C entry points."""
    lib = load()
    for kind, (varlen, backward) in enumerate(
        [(False, False), (True, False), (False, True), (True, True)]
    ):
        fn = EXECUTOR_FN(
            lambda ptr, v=varlen, b=backward: _jax_executor(ptr, varlen=v, backward=b)
        )
        _keepalive.append(fn)
        lib.fatpu_register_executor(kind, fn)
    return lib


class PagePool:
    """Python wrapper over the native page allocator."""

    def __init__(self, num_pages: int):
        self._lib = load()
        self._pool = self._lib.fatpu_pool_create(num_pages)
        if not self._pool:
            raise ValueError(f"could not create pool with {num_pages} pages")

    def acquire(self, slot: int, n: int) -> list[int] | None:
        out = (c_int32 * n)()
        got = self._lib.fatpu_pool_acquire(self._pool, slot, n, out)
        if got < 0:
            return None
        return list(out[:got])

    def release_slot(self, slot: int) -> int:
        return self._lib.fatpu_pool_release_slot(self._pool, slot)

    @property
    def free_count(self) -> int:
        return self._lib.fatpu_pool_free_count(self._pool)

    def owner(self, page: int) -> int:
        return self._lib.fatpu_pool_owner(self._pool, page)

    def transfer(self, pages, new_slot: int) -> int:
        """Move ownership of specific pages to ``new_slot`` (prefix-cache
        donation); returns the number transferred."""
        arr = (c_int32 * len(pages))(*pages)
        return self._lib.fatpu_pool_transfer(
            self._pool, arr, len(pages), new_slot
        )

    def release_pages(self, pages) -> int:
        """Free specific pages (prefix-cache eviction); idempotent."""
        arr = (c_int32 * len(pages))(*pages)
        return self._lib.fatpu_pool_release_pages(self._pool, arr, len(pages))

    def __del__(self):
        if getattr(self, "_pool", None) and self._lib:
            self._lib.fatpu_pool_destroy(self._pool)
            self._pool = None
