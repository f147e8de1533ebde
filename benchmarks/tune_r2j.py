"""Round-2j: old-vs-new decode kernel in ONE process (same chip state, same
relay session) — resolves whether the r2h "regression" is real or session
drift.  _decode_orig.py is a snapshot of HEAD's decode.py.

Run: python tools/run_on_tpu.py benchmarks/tune_r2j.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def paired(fn_n, fn_2n, n, iters=7):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def main():
    import jax
    import jax.numpy as jnp

    import _decode_orig
    from flash_attn_tpu.ops import decode as dec_new
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kv_bytes = 2 * B * S * Hk * (D + 4)
    ideal = kv_bytes / 819e9

    cases = []
    for mode, bk in (("int8", 512), ("fp8", 2048)):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        cases.append((mode, bk, jnp.swapaxes(kq, 1, 2),
                      jnp.swapaxes(vq, 1, 2), jnp.swapaxes(ks, 1, 2),
                      jnp.swapaxes(vs, 1, 2)))

    # interleave old/new twice to expose intra-session drift
    for rnd in range(2):
        for name, mod in (("orig", _decode_orig), ("new", dec_new)):
            for mode, bk, kqt, vqt, kst, vst in cases:
                fd = mod.flash_decode

                def mk(m, bk=bk, fd=fd, kqt=kqt, vqt=vqt, kst=kst, vst=vst):
                    @jax.jit
                    def f(q_, k_, v_, ks_, vs_):
                        y = jax.lax.fori_loop(
                            0, m,
                            lambda i, c: fd(
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
                print(f"r{rnd} {name} {mode} bk={bk}: {t*1e6:.1f} us, "
                      f"frac {ideal/t:.3f}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
