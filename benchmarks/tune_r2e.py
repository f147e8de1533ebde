"""Round-2e: fp8 decode with very large blocks (v5e VMEM is 128MB — room
for deep double-buffering) + retry the llama-8B step bench with params as
jit arguments (not baked literals).

Run: python tools/run_on_tpu.py benchmarks/tune_r2e.py
"""

import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def bench_fp8_big_blocks():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)

    for mode in ("fp8", "int8"):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kqt = jnp.swapaxes(kq, 1, 2)
        vqt = jnp.swapaxes(vq, 1, 2)
        kst = jnp.swapaxes(ks, 1, 2)
        vst = jnp.swapaxes(vs, 1, 2)
        kv_bytes = 2 * B * S * Hk * (D + 4)
        ideal = kv_bytes / 819e9

        for bk in (2048, 4096, 8192):
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

                float(f(q, kqt, vqt, kst, vst)); float(f(q, kqt, vqt, kst, vst))
                return lambda: float(f(q, kqt, vqt, kst, vst))

            try:
                f1, f2 = mk(256), mk(512)
                t = paired(f1, f2, 256)
                print(f"{mode} bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f}",
                      flush=True)
            except Exception as e:
                print(f"{mode} bk={bk}: FAIL {repr(e)[:150]}", flush=True)


def bench_llama():
    from bench import bench_llama8b_decode
    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    out = bench_llama8b_decode(CHIP_PEAKS[chip_kind()])
    print("llama8b:", out, flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    bench_fp8_big_blocks()
    try:
        bench_llama()
    except Exception as e:
        print("llama8b FAIL:", repr(e)[:300], flush=True)
