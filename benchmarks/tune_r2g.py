"""Round-2g: validate + time the reworked BHSD decode kernel on chip:
few-mask fp8 decode, full-block mask skip, host-folded softmax scale,
split-KV grid axis, kv_len DMA clamp.

Run: python tools/run_on_tpu.py benchmarks/tune_r2g.py
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

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)

    # --- correctness: kernel vs fp32 oracle, incl. ragged lens + splits ---
    lens = jnp.asarray([S, S - 1, 5000, 1, 128, 8191, 2048, 300], jnp.int32)
    for mode in ("none", "int8", "fp8"):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        ref = flash_decode(
            q, kq, vq, kv_length=lens, k_scale=ks, v_scale=vs,
            use_kernel=False, kv_layout="bshd",
        )
        kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
        kst = None if ks is None else jnp.swapaxes(ks, 1, 2)
        vst = None if vs is None else jnp.swapaxes(vs, 1, 2)
        for nsp in (1, 4):
            got = flash_decode(
                q, kqt, vqt, kv_length=lens, k_scale=kst, v_scale=vst,
                kv_layout="bhsd", block_k=512, num_splits=nsp,
            )
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            tol = {"none": 6e-3, "int8": 6e-3, "fp8": 4e-2}[mode]
            status = "ok" if err < tol else "FAIL"
            print(f"{mode} nsp={nsp}: maxerr {err:.2e} {status}", flush=True)

    # --- perf: full cache ---
    kv_bytes_i8 = 2 * B * S * Hk * (D + 4)
    for mode, bks in (("int8", (512,)), ("fp8", (1024, 2048))):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
        kst, vst = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)
        ideal = kv_bytes_i8 / 819e9
        for bk in bks:
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

            t = paired(mk(256), mk(512), 256)
            print(f"{mode} bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f}",
                  flush=True)

    # --- perf: half-filled cache (kv_len = S/2) — DMA clamp should ~halve
    # the time; before the clamp it streamed all S regardless ---
    mode = "int8"
    kq, ks, vq, vs = quantize_kv(k, v, mode)
    kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    kst, vst = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)
    half_lens = jnp.full((B,), S // 2, jnp.int32)

    def mk_half(m):
        @jax.jit
        def f(q_, k_, v_, ks_, vs_, lens_):
            y = jax.lax.fori_loop(
                0, m,
                lambda i, c: flash_decode(
                    c, k_, v_, kv_length=lens_, k_scale=ks_, v_scale=vs_,
                    kv_layout="bhsd", block_k=512,
                ).astype(jnp.bfloat16),
                q_,
            )
            return jnp.sum(y.astype(jnp.float32))

        float(f(q, kqt, vqt, kst, vst, half_lens))
        float(f(q, kqt, vqt, kst, vst, half_lens))
        return lambda: float(f(q, kqt, vqt, kst, vst, half_lens))

    t = paired(mk_half(256), mk_half(512), 256)
    ideal_half = kv_bytes_i8 / 2 / 819e9
    print(f"int8 half-cache: {t*1e6:.1f} us, frac-of-half-roofline "
          f"{ideal_half/t:.3f}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
