"""Round-2q: backward-kernel block sweep at the 8B prefill shape (the bwd
kernels were correctness-validated in round 1 but never block-tuned;
VERDICT weak #2 asked for a tuned bwd perf number).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2q.py
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

    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    dout = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    out, lse = jax.jit(lambda a, b, c: flash_fwd(a, b, c, causal=True))(q, k, v)
    flops = 2.5 * 4 * B * H * S * S * D / 2

    ref = None
    for bq, bk in ((256, 512), (512, 512), (256, 1024), (512, 1024),
                   (128, 512), (512, 256), (1024, 512), (1024, 1024)):
        cfg = FlashConfig(block_q=bq, block_k=bk)

        def mk(m, cfg=cfg):
            @jax.jit
            def f(dout_, q_, k_, v_, out_, lse_):
                def body(i, c):
                    dq, dk, dv = flash_bwd(q_, k_, v_, out_, lse_, c,
                                           causal=True, config=cfg)
                    return dq.astype(jnp.bfloat16)

                y = jax.lax.fori_loop(0, m, body, dout_)
                return jnp.sum(y.astype(jnp.float32))

            float(f(dout, q, k, v, out, lse))
            float(f(dout, q, k, v, out, lse))
            return lambda: float(f(dout, q, k, v, out, lse))

        try:
            dq = jax.jit(lambda: flash_bwd(q, k, v, out, lse, dout,
                                           causal=True, config=cfg)[0])()
            if ref is None:
                ref, err = dq.astype(jnp.float32), 0.0
            else:
                err = float(jnp.max(jnp.abs(dq.astype(jnp.float32) - ref)))
            t = paired(mk(2), mk(4), 2)
            tf = flops / t / 1e12
            print(f"bwd bq={bq} bk={bk}: {t*1e3:.2f} ms, {tf:.1f} TF/s, "
                  f"{tf/197:.3f} of peak, dq err {err:.1e}", flush=True)
        except Exception as e:
            print(f"bwd bq={bq} bk={bk}: FAIL {repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
