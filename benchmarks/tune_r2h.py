"""Round-2h: ablate the reworked decode kernel — which change regressed
int8 from 1.01 to 0.84?  Combos of (_DMA_CLAMP, _SPLIT_BODY) on int8
bk=512 and fp8 bk=2048, plus correctness after the exact f32 scale fold.

Run: python tools/run_on_tpu.py benchmarks/tune_r2h.py
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

    from flash_attn_tpu.ops import decode as dec
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kv_bytes = 2 * B * S * Hk * (D + 4)
    ideal = kv_bytes / 819e9

    # correctness spot-check (exact f32 scale fold should cut int8 err)
    lens = jnp.asarray([S, S - 1, 5000, 1, 128, 8191, 2048, 300], jnp.int32)
    for mode in ("int8", "fp8"):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        ref = flash_decode(
            q, kq, vq, kv_length=lens, k_scale=ks, v_scale=vs,
            use_kernel=False, kv_layout="bshd",
        )
        got = flash_decode(
            q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
            kv_length=lens, k_scale=jnp.swapaxes(ks, 1, 2),
            v_scale=jnp.swapaxes(vs, 1, 2), kv_layout="bhsd",
            block_k=512, num_splits=4,
        )
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{mode} nsp=4 maxerr {err:.2e}", flush=True)

    cases = []
    for mode, bk in (("int8", 512), ("fp8", 2048)):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        cases.append((mode, bk, jnp.swapaxes(kq, 1, 2),
                      jnp.swapaxes(vq, 1, 2), jnp.swapaxes(ks, 1, 2),
                      jnp.swapaxes(vs, 1, 2)))

    for clamp in (True, False):
        for split in (True, False):
            dec._DMA_CLAMP = clamp
            dec._SPLIT_BODY = split
            for mode, bk, kqt, vqt, kst, vst in cases:
                def mk(m, bk=bk, kqt=kqt, vqt=vqt, kst=kst, vst=vst):
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
                    t = paired(mk(256), mk(512), 256)
                    print(
                        f"clamp={int(clamp)} split={int(split)} {mode} "
                        f"bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f}",
                        flush=True,
                    )
                except Exception as e:
                    print(f"clamp={int(clamp)} split={int(split)} {mode}: "
                          f"FAIL {repr(e)[:120]}", flush=True)
    dec._DMA_CLAMP = True
    dec._SPLIT_BODY = True


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
