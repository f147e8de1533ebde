"""Round-2d on-chip session: packed-v2 fp8 decode (half-GEMMs, no KV
concat), fwd exp2 A/B, and the shrunk llama-8B step bench.

Run: python tools/run_on_tpu.py benchmarks/tune_r2d.py
"""

import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def bench_fp8_v2():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

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

    got = jax.jit(
        lambda q_, k_, v_, ks_, vs_: flash_decode(
            q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd"
        )
    )(q, kqt, vqt, kst, vst)
    want = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, use_kernel=False)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"fp8-v2 correctness: max err {err:.3e}", flush=True)

    kv_bytes = 2 * B * S * Hk * (D + 4)
    ideal = kv_bytes / 819e9
    for bk in (512, 1024, 2048):
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
            print(f"fp8-v2 bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f}",
                  flush=True)
        except Exception as e:
            print(f"fp8-v2 bk={bk}: FAIL {repr(e)[:150]}", flush=True)


def bench_fwd_exp2():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2

    def run(cfg, tag, n=8):
        def mk(m):
            @jax.jit
            def f(q_, k_, v_):
                y = jax.lax.fori_loop(
                    0, m,
                    lambda i, c: flash_fwd(c, k_, v_, causal=True, config=cfg)[0],
                    q_,
                )
                return jnp.sum(y.astype(jnp.float32))

            float(f(q, k, v)); float(f(q, k, v))
            return lambda: float(f(q, k, v))

        try:
            f1, f2 = mk(n), mk(2 * n)
        except Exception as e:
            print(f"{tag}: COMPILE FAIL {repr(e)[:120]}", flush=True)
            return
        t = paired(f1, f2, n)
        print(f"{tag}: {t*1e3:.2f} ms, {flops/t/1e12:.1f} TF/s", flush=True)

    for e2 in (False, True):
        run(FlashConfig(block_q=1024, block_k=1024, exp2=e2),
            f"fwd exp2={int(e2)} 1024x1024")
    run(FlashConfig(block_q=1536, block_k=1024, exp2=True), "fwd exp2 1536x1024")
    run(FlashConfig(block_q=1024, block_k=1536, exp2=True), "fwd exp2 1024x1536")


def bench_llama():
    from bench import bench_llama8b_decode
    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    out = bench_llama8b_decode(CHIP_PEAKS[chip_kind()])
    print("llama8b:", out, flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    bench_fp8_v2()
    bench_fwd_exp2()
    try:
        bench_llama()
    except Exception as e:
        print("llama8b FAIL:", repr(e)[:300], flush=True)
