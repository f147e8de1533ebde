"""Round-2n: unbiased packed fp8 decode (2^120 rebias folded into the
softmax scale / p-shift; 9 int-ops per i32 word vs 11) + in-kernel q-side
softmax-scale fold for all modes.

Correctness: packed fp8 vs bf16 reference, including a uniform-attention
case (q=0) that would break a naive post-GEMM rebias (fp32 denormal flush
of every small PV product).  Timing at the 8B decode shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2n.py
"""

import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=7):
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
    k = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, Hk, D), jnp.bfloat16)
    kv_bytes = 2 * B * S * Hk * (D + 4)
    ideal = kv_bytes / 819e9

    kt, vt = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    o_ref = flash_decode(q, kt, vt, kv_layout="bhsd")

    cases = []
    for mode, bks in (("int8", (512,)), ("fp8", (2048, 4096))):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
        kst, vst = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)
        # correctness vs bf16 (first bk only)
        o_q = flash_decode(q, kqt, vqt, k_scale=kst, v_scale=vst,
                           kv_layout="bhsd", block_k=bks[0])
        e = float(jnp.max(jnp.abs(o_q.astype(jnp.float32)
                                  - o_ref.astype(jnp.float32))))
        print(f"{mode} maxerr vs bf16: {e:.2e}", flush=True)
        assert e < 5e-2, (mode, e)
        if mode == "fp8":
            # uniform attention: q=0 -> p=1/S everywhere; a denormal-flushed
            # rebias would zero the output instead of mean(v)
            o_u = flash_decode(jnp.zeros_like(q), kqt, vqt, k_scale=kst,
                               v_scale=vst, kv_layout="bhsd", block_k=bks[0])
            ref_u = jnp.mean(v.astype(jnp.float32), axis=1)  # [B, Hk, D]
            ref_u = jnp.repeat(ref_u, H // Hk, axis=1)
            eu = float(jnp.max(jnp.abs(o_u.astype(jnp.float32) - ref_u)))
            print(f"fp8 uniform-attention maxerr: {eu:.2e}", flush=True)
            assert eu < 5e-2, eu
        cases.append((mode, bks, kqt, vqt, kst, vst))

    for mode, bks, kqt, vqt, kst, vst in cases:
        for bk in bks:
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
                print(f"{mode} bk={bk}: {t*1e6:.1f} us, frac {ideal/t:.3f}",
                      flush=True)
            except Exception as e:
                print(f"{mode} bk={bk}: FAIL {repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
