"""Round-2f: fp8 decode variants to close 0.82 -> >=0.90 of HBM roofline.

Variants (monkeypatched into ops.decode._packed_e4m3_halves, timed through
the real flash_decode BHSD kernel at the 8B shape):
  A  current packed-pair decode (~3.5 int-ops/elem)
  B  fewer-mask decode: fold the byte-select mask into the post-shift mask,
     use in-place sign bits for odd bytes (~2.75 ops/elem)
  D  int16-lane decode: bitcast to i16, one bf16 per lane op (2x if the VPU
     runs 16-bit ops packed)
  C  e5m2-style decode: masked shift yields fp16 bits directly (~0.75
     ops/elem + one convert) — PERF PROBE ONLY here (bytes are e4m3, values
     are garbage; numerics validated separately if the timing wins)

Run: python tools/run_on_tpu.py benchmarks/tune_r2f.py
"""

import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from flash_attn_tpu.ops import decode as dec
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    def halves_b(x):
        w = pltpu.bitcast(x, jnp.int32)
        ev = (((w << 4) & 0x07F007F0) + 0x3C003C00) | ((w & 0x00800080) << 8)
        od = (((w >> 4) & 0x07F007F0) + 0x3C003C00) | (w & -2147450880)
        return pltpu.bitcast(ev, jnp.bfloat16), pltpu.bitcast(od, jnp.bfloat16)

    def halves_d(x):
        w = pltpu.bitcast(x, jnp.int16)  # [..., bk/2, D]
        ev = (((w << 4) & 0x07F0) + 0x3C00) | ((w & 0x0080) << 8)
        od = (((w >> 4) & 0x07F0) + 0x3C00) | (w & jnp.int16(-32768))
        return pltpu.bitcast(ev, jnp.bfloat16), pltpu.bitcast(od, jnp.bfloat16)

    def halves_c(x):
        w = pltpu.bitcast(x, jnp.int32)
        ev = (w << 8) & -16711936  # 0xFF00FF00
        od = w & -16711936
        evf = pltpu.bitcast(ev, jnp.float16).astype(jnp.bfloat16)
        odf = pltpu.bitcast(od, jnp.float16).astype(jnp.bfloat16)
        return evf, odf

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kq, ks, vq, vs = quantize_kv(k, v, "fp8")
    kqt = jnp.swapaxes(kq, 1, 2)
    vqt = jnp.swapaxes(vq, 1, 2)
    kst = jnp.swapaxes(ks, 1, 2)
    vst = jnp.swapaxes(vs, 1, 2)
    kv_bytes = 2 * B * S * Hk * (D + 4)
    ideal = kv_bytes / 819e9

    # correctness reference (fp32 oracle through the same quantized values)
    ref = flash_decode(
        q, kq, vq, k_scale=ks, v_scale=vs, use_kernel=False,
        kv_layout="bshd", interpret=False,
    )

    orig = dec._packed_e4m3_halves
    for name, fn, check in (
        ("A-current", orig, True),
        ("B-fewmask", halves_b, True),
        ("D-int16", halves_d, True),
        ("C-e5m2probe", halves_c, False),
    ):
        dec._packed_e4m3_halves = fn
        try:
            for bk in (1024, 2048):
                def mk(m, bk=bk):
                    @jax.jit
                    def f(q_, k_, v_, ks_, vs_):
                        y = jax.lax.fori_loop(
                            0, m,
                            lambda i, c: flash_decode(
                                c, k_, v_, k_scale=ks_, v_scale=vs_,
                                kv_layout="bhsd", block_k=bk,
                            ).astype(jnp.bfloat16),
                            q_,
                        )
                        return jnp.sum(y.astype(jnp.float32))

                    float(f(q, kqt, vqt, kst, vst))
                    float(f(q, kqt, vqt, kst, vst))
                    return lambda: float(f(q, kqt, vqt, kst, vst))

                try:
                    if check:
                        got = flash_decode(
                            q, kqt, vqt, k_scale=kst, v_scale=vst,
                            kv_layout="bhsd", block_k=bk,
                        )
                        err = float(
                            jnp.max(jnp.abs(got.astype(jnp.float32)
                                            - ref.astype(jnp.float32)))
                        )
                    else:
                        err = float("nan")
                    f1, f2 = mk(256), mk(512)
                    t = paired(f1, f2, 256)
                    print(
                        f"{name} bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f},"
                        f" maxerr {err:.2e}",
                        flush=True,
                    )
                except Exception as e:
                    print(f"{name} bk={bk}: FAIL {repr(e)[:150]}", flush=True)
        finally:
            dec._packed_e4m3_halves = orig


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
