"""Round-2b on-chip session: (1) fwd mask-skip A/B, (2) packed-fp8 decode
correctness + bench, (3) W8A8 matmul correctness + bench.

Run: python tools/run_on_tpu.py benchmarks/tune_r2b.py
"""

import functools
import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def bench_fwd():
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

    for bq, bk in [(1024, 1024), (512, 1024), (1024, 512), (2048, 1024), (768, 1024)]:
        run(FlashConfig(block_q=bq, block_k=bk), f"1dmask {bq}x{bk}")


def bench_fp8_decode():
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

        # correctness vs jnp oracle (dequant-then-float)
        got = jax.jit(
            lambda q_, k_, v_, ks_, vs_: flash_decode(
                q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd"
            )
        )(q, kqt, vqt, kst, vst)
        want = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, use_kernel=False)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"decode {mode} correctness: max err {err:.3e}", flush=True)

        kv_bytes = 2 * B * S * Hk * (D + 4)
        ideal = kv_bytes / 819e9

        def mk(m):
            @jax.jit
            def f(q_, k_, v_, ks_, vs_):
                y = jax.lax.fori_loop(
                    0, m,
                    lambda i, c: flash_decode(
                        c, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd"
                    ).astype(jnp.bfloat16),
                    q_,
                )
                return jnp.sum(y.astype(jnp.float32))

            float(f(q, kqt, vqt, kst, vst)); float(f(q, kqt, vqt, kst, vst))
            return lambda: float(f(q, kqt, vqt, kst, vst))

        n = 256
        f1, f2 = mk(n), mk(2 * n)
        t = paired(f1, f2, n)
        print(
            f"decode {mode}: {t*1e6:.1f} us, roofline frac {ideal/t:.3f}",
            flush=True,
        )

        for bk in (1024, 2048):
            def mkb(m, bk=bk):
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
                f1, f2 = mkb(n), mkb(2 * n)
                t = paired(f1, f2, n)
                print(
                    f"decode {mode} bk={bk}: {t*1e6:.1f} us, "
                    f"roofline frac {ideal/t:.3f}",
                    flush=True,
                )
            except Exception as e:
                print(f"decode {mode} bk={bk}: FAIL {repr(e)[:150]}", flush=True)


def bench_w8a8():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.matmul import matmul_int8, matmul_w8a8, quantize_activations
    from flash_attn_tpu.ops.quant import quantize_int8

    M, K, N = 16, 4096, 28672  # mlp up+gate fused shape
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(4), (K, N), jnp.float32)
    wq, wscale = quantize_int8(w, axes=(0,))
    wscale1 = wscale[0]

    got = jax.jit(lambda x_, w_, s_: matmul_w8a8(x_, w_, s_))(x, wq, wscale1)
    xq, sx = quantize_activations(x)
    want = (
        (xq.astype(jnp.float32) @ wq.astype(jnp.float32)) * sx
        * wscale1[None, :]
    )
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    print(f"w8a8 correctness: max abs err {err:.3e} (rel {rel:.2e})", flush=True)

    ideal = K * N / 819e9  # weight-streaming roofline (1 byte/elem)

    def mk_chain(matmul, m):
        @jax.jit
        def f(x_, w_, s_):
            def body(i, c):
                y = matmul(c, w_, s_)
                # fold output back to [M, K] cheaply for data dependence
                return (c + jnp.sum(y, axis=1, keepdims=True) * 0).astype(c.dtype)

            return jnp.sum(jax.lax.fori_loop(0, m, body, x_).astype(jnp.float32))

        float(f(x, wq, wscale1)); float(f(x, wq, wscale1))
        return lambda: float(f(x, wq, wscale1))

    n = 32
    for name, mm in [("w8a8", matmul_w8a8), ("int8-weightonly", matmul_int8)]:
        try:
            f1 = mk_chain(mm, n)
            f2 = mk_chain(mm, 2 * n)
            t = paired(f1, f2, n)
            print(
                f"{name} mlp-up/gate: {t*1e6:.1f} us, "
                f"streaming-roofline frac {ideal/t:.3f}",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAIL {repr(e)[:200]}", flush=True)


def bench_llama():
    from bench import bench_llama8b_decode
    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    out = bench_llama8b_decode(CHIP_PEAKS[chip_kind()])
    print("llama8b:", out, flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    bench_fp8_decode()
    bench_fwd()
    bench_llama()
