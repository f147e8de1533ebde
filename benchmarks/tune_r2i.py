"""Round-2i: FA2 forward sweep at the 8B prefill shape — split_causal_mask
(maskless body for fully-live blocks) x block shapes.  Target >= 0.70 of
bf16 peak (VERDICT item 5; round-2 honest baseline: 114.9 TF/s = 58% at
1024x1024).

Run: python tools/run_on_tpu.py benchmarks/tune_r2i.py
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

    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2
    peak = 197e12

    ref = None
    for bq, bk, split, exp2 in (
        (1024, 1024, False, False),
        (1024, 1024, True, False),
        (1024, 1024, True, True),
        (2048, 1024, True, False),
        (1024, 2048, True, False),
        (2048, 512, True, False),
        (512, 1024, True, False),
        (2048, 2048, True, False),
    ):
        cfg = FlashConfig(block_q=bq, block_k=bk, split_causal_mask=split,
                          exp2=exp2)

        def mk(m):
            @jax.jit
            def f(q_, k_, v_):
                def body(i, c):
                    o, _ = flash_fwd(c, k_, v_, causal=True, config=cfg)
                    return o.astype(jnp.bfloat16)

                y = jax.lax.fori_loop(0, m, body, q_)
                return jnp.sum(y.astype(jnp.float32))

            float(f(q, k, v)); float(f(q, k, v))
            return lambda: float(f(q, k, v))

        try:
            out, _ = jax.jit(
                lambda a, b, c: flash_fwd(a, b, c, causal=True, config=cfg)
            )(q, k, v)
            if ref is None:
                ref = out.astype(jnp.float32)
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            t = paired(mk(4), mk(8), 4)
            tf = flops / t / 1e12
            print(
                f"bq={bq} bk={bk} split={int(split)} exp2={int(exp2)}: "
                f"{t*1e3:.2f} ms, {tf:.1f} TF/s, {tf/197:.3f} of peak, "
                f"err-vs-first {err:.1e}",
                flush=True,
            )
        except Exception as e:
            print(f"bq={bq} bk={bk} split={int(split)}: FAIL {repr(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
