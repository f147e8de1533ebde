"""Round-2u: int8 decode at the production default block (bk=2048) —
online vs clamped (tune_r2s only measured int8 at bk=512, where clamped
lost; the wide-block default may reverse that).  Also re-pins fp8 defaults
in the same session for a same-noise comparison.

Run: PALLAS_AXON_POOL_IPS= python tools/run_on_tpu.py benchmarks/tune_r2u.py
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
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hk, D), jnp.bfloat16)

    for mode in ("int8", "fp8"):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kv_bytes = 2 * B * S * Hk * (D + 4)
        kt = jnp.swapaxes(kq, 1, 2)
        vt = jnp.swapaxes(vq, 1, 2)
        kst = jnp.swapaxes(ks, 1, 2)
        vst = jnp.swapaxes(vs, 1, 2)
        ideal = kv_bytes / 819e9  # v5e HBM

        ref = None
        for sm in ("online", "clamped"):
            for bk in (2048, 1024):
                def mk(m, sm=sm, bk=bk):
                    @jax.jit
                    def f(q_, k_, v_, ks_, vs_):
                        def body(i, x):
                            o = flash_decode(
                                x, k_, v_, k_scale=ks_, v_scale=vs_,
                                kv_layout="bhsd", block_k=bk,
                                softmax_mode=sm,
                            )
                            return o.astype(jnp.bfloat16)

                        y = jax.lax.fori_loop(0, m, body, q_)
                        return jnp.sum(y.astype(jnp.float32))

                    float(f(q, kt, vt, kst, vst))
                    float(f(q, kt, vt, kst, vst))
                    return lambda: float(f(q, kt, vt, kst, vst))

                try:
                    out = jax.jit(
                        lambda sm=sm, bk=bk: flash_decode(
                            q, kt, vt, k_scale=kst, v_scale=vst,
                            kv_layout="bhsd", block_k=bk, softmax_mode=sm,
                        ))()
                    o32 = out.astype(jnp.float32)
                    if ref is None:
                        ref, err = o32, 0.0
                    else:
                        err = float(jnp.max(jnp.abs(o32 - ref)))
                    t = paired(mk(32), mk(64), 32)
                    print(f"decode {mode} {sm} bk={bk}: {t*1e6:.1f} us, "
                          f"{ideal/t:.3f} of roofline, maxdiff {err:.2e}",
                          flush=True)
                except Exception as e:
                    print(f"decode {mode} {sm} bk={bk}: FAIL {repr(e)[:160]}",
                          flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
