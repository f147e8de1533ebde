"""Round-2l: triangular flattened causal grid vs predicated rectangular
grid at the 8B prefill shape (target >= 0.70 of bf16 peak; r2k measured the
noncausal pipeline ceiling at 0.691 and predicated-causal at 0.625).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2l.py
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

    ref = None
    for bq, bk, tri in (
        (1024, 1024, False),
        (1024, 1024, True),
        (512, 1024, True),
        (1024, 512, True),
        (768, 1024, True),
        (1024, 1536, True),
        (1536, 1024, True),
    ):
        cfg = FlashConfig(block_q=bq, block_k=bk, split_causal_mask=True,
                          triangular=tri)

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
                f"bq={bq} bk={bk} tri={int(tri)}: {t*1e3:.2f} ms, "
                f"{tf:.1f} TF/s, {tf/197:.3f} of peak, err {err:.1e}",
                flush=True,
            )
        except Exception as e:
            print(f"bq={bq} bk={bk} tri={int(tri)}: FAIL {repr(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
