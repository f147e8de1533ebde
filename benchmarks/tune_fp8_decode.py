"""FP8-decode experiments (round 2, VERDICT item 3: fp8 KV decode 0.65 ->
>=0.90 of HBM roofline).

Phase 1: probe pltpu.bitcast's fp8->int32 sublane packing order (empirical).
Phase 2: bench decode variants at the bench shape.

Run on TPU: python tools/run_on_tpu.py benchmarks/tune_fp8_decode.py
"""

import functools
import time

import numpy as np


def probe_bitcast():
    """Determine which 4 rows of an fp8 [32, 128] tile pack into each i32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.bitcast(x_ref[...], jnp.int32)

    # row r, col c -> byte value r (so each i32 word reveals its 4 source rows)
    x = np.tile(np.arange(32, dtype=np.uint8)[:, None], (1, 128))
    xf = jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.float8_e4m3fn)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(xf)
    w = np.asarray(out)
    print("bitcast probe (each word's 4 source rows, little-endian bytes):")
    for i in range(8):
        word = int(w[i, 0]) & 0xFFFFFFFF
        rows = [(word >> (8 * j)) & 0xFF for j in range(4)]
        print(f"  word row {i}: source rows {rows}")
    return w


def probe_lane_bitcast():
    """Can Mosaic lower lax.bitcast_convert_type u8[...,4] -> i32?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x = x_ref[...]  # [32, 128] fp8
        u = jax.lax.bitcast_convert_type(x, jnp.uint8)
        u4 = u.reshape(32, 32, 4)
        w = jax.lax.bitcast_convert_type(u4, jnp.int32)  # [32, 32]
        o_ref[...] = jnp.pad(w, ((0, 0), (0, 96)))

    x = np.tile(np.arange(128, dtype=np.uint8)[None, :], (32, 1))
    import jax

    xf = jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.float8_e4m3fn)
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32)
        )(xf)
        w = np.asarray(out)
        word = int(w[0, 0]) & 0xFFFFFFFF
        lanes = [(word >> (8 * j)) & 0xFF for j in range(4)]
        print(f"lane bitcast OK; word 0 source lanes: {lanes}")
        return True
    except Exception as e:
        print(f"lane bitcast FAILED: {repr(e)[:200]}")
        return False


# ---------------------------------------------------------------------------
# Decode micro-bench: isolate the cast path inside a decode-like kernel.
# ---------------------------------------------------------------------------


def packed_e4m3_to_bf16(w):
    """Decode an i32 word vector holding 4 e4m3 bytes into two i32 word
    vectors each holding 2 packed bf16 (even bytes, odd bytes).

    e4m3 (s eeee mmm, bias 7) -> bf16 (s e8 m7, bias 127): shift left 4,
    add (127-7)<<7 to the exponent field, move sign bit 11 -> 15.
    Denormals (e==0) decode ~2^-7 * scale instead of ~0 — a 1.7e-5-of-absmax
    error, far below e4m3's 6% quantization error, so no flush is needed.
    """
    import jax.numpy as jnp

    even_t = (w & 0x00FF00FF) << 4
    even = ((even_t & 0x07F007F0) + 0x3C003C00) | ((even_t & 0x08000800) << 4)
    odd_t = (w >> 4) & 0x0FF00FF0
    odd = ((odd_t & 0x07F007F0) + 0x3C003C00) | ((odd_t & 0x08000800) << 4)
    return even, odd


def bench_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from flash_attn_tpu.ops.decode import _fast_cast

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    BK = 512

    key = jax.random.PRNGKey(0)
    kq = jax.random.normal(key, (B, Hk, S, D), jnp.float32).astype(
        jnp.float8_e4m3fn
    )

    def mk_kernel(cast_fn):
        def kernel(k_ref, o_ref, acc):
            ki = pl.program_id(1)

            @pl.when(ki == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            kb = cast_fn(k_ref[0])  # [Hk, bk, D] -> bf16
            acc[...] += jnp.sum(kb.astype(jnp.float32), axis=1)

            @pl.when(ki == S // BK - 1)
            def _():
                o_ref[0] = acc[...].astype(jnp.float32)

        return kernel

    def cast_current(x):
        return _fast_cast(x, jnp.bfloat16)

    def cast_native(x):
        return x.astype(jnp.bfloat16)

    def cast_packed(x):
        # x: [Hk, bk, D] fp8.  bitcast packs along the second-minor dim (bk):
        # rows {4i..4i+3} (order per probe) into one i32 word.
        w = pltpu.bitcast(x, jnp.int32)  # [Hk, bk//4, D]
        even, odd = packed_e4m3_to_bf16(w)
        ev = pltpu.bitcast(even, jnp.bfloat16)  # [Hk, bk//2, D]
        od = pltpu.bitcast(odd, jnp.bfloat16)
        return jnp.concatenate([ev, od], axis=1)  # permuted along bk

    variants = {
        "current_bitdecode": cast_current,
        "native_convert": cast_native,
        "packed_pair": cast_packed,
    }

    def run(name, cast_fn):
        kern = mk_kernel(cast_fn)
        f = pl.pallas_call(
            kern,
            grid=(B, S // BK),
            in_specs=[
                pl.BlockSpec((1, Hk, BK, D), lambda b, ki: (b, 0, ki, 0))
            ],
            out_specs=pl.BlockSpec((1, Hk, D), lambda b, ki: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Hk, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Hk, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
        )

        @jax.jit
        def chain(x, n_arr):
            def body(i, c):
                y = f(c)
                # feed a data dependence back into the input (cheap)
                return x + (y[0, 0, 0] * 0).astype(x.dtype)

            return jax.lax.fori_loop(0, 64, body, x)[0, 0, 0, 0].astype(
                jnp.float32
            )

        # correctness check first (vs dequant on host) for packed variant
        float(chain(kq, 0))
        float(chain(kq, 0))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(kq, 0))
            times.append(time.perf_counter() - t0)
        t_n = float(np.median(times))

        @jax.jit
        def chain2(x, n_arr):
            def body(i, c):
                y = f(c)
                return x + (y[0, 0, 0] * 0).astype(x.dtype)

            return jax.lax.fori_loop(0, 128, body, x)[0, 0, 0, 0].astype(
                jnp.float32
            )

        float(chain2(kq, 0))
        times2 = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain2(kq, 0))
            times2.append(time.perf_counter() - t0)
        t_2n = float(np.median(times2))
        per = (t_2n - t_n) / 64
        bytes_ = B * Hk * S * D
        print(
            f"{name}: {per*1e6:.1f} us/pass, {bytes_/per/1e9:.0f} GB/s "
            f"(K-only stream)"
        )

    for name, fn in variants.items():
        try:
            run(name, fn)
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:300]}")


def check_packed_correctness():
    """Verify packed decode == float(fp8) up to the denormal approximation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hk, BK, D = 2, 128, 128
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (Hk, BK, D), jnp.float32).astype(
        jnp.float8_e4m3fn
    )

    def kernel(x_ref, o_ref):
        w = pltpu.bitcast(x_ref[...], jnp.int32)
        even, odd = packed_e4m3_to_bf16(w)
        ev = pltpu.bitcast(even, jnp.bfloat16)
        od = pltpu.bitcast(odd, jnp.bfloat16)
        o_ref[...] = jnp.concatenate([ev, od], axis=1).astype(jnp.float32)

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((Hk, BK, D), jnp.float32)
    )(x)
    out = np.asarray(out)
    want = np.asarray(x.astype(jnp.float32))
    # Determine the row permutation empirically: for each output row, find
    # the matching source row.
    perm = []
    for r in range(BK):
        d = np.abs(out[0, r][None, :] - want[0][:, :]).max(axis=1)
        perm.append(int(d.argmin()))
    err = np.abs(out[0] - want[0][perm]).max()
    print(f"packed decode: max err vs permuted source = {err:.2e}")
    print(f"perm head: {perm[:16]} ... tail: {perm[-8:]}")
    return perm


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices())
    probe_bitcast()
    probe_lane_bitcast()
    check_packed_correctness()
    bench_variants()
