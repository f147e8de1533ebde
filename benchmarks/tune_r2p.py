"""Round-2p: softmax_dtype='bf16' in the real fwd kernel at the 8B prefill
shape (probe r2o: stats-free ceiling 0.923, bf16-softmax probe 0.710 vs
f32 baseline 0.608) + accuracy vs the fp32 oracle at S=2048.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2p.py
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
    from flash_attn_tpu.ops.reference import mha_reference

    # accuracy first (S=2048 so the oracle fits)
    ka = jax.random.PRNGKey(7)
    qa = jax.random.normal(ka, (1, 2048, 8, 128), jnp.bfloat16)
    kka = jax.random.normal(jax.random.PRNGKey(8), (1, 2048, 2, 128), jnp.bfloat16)
    va = jax.random.normal(jax.random.PRNGKey(9), (1, 2048, 2, 128), jnp.bfloat16)
    ref = mha_reference(qa.astype(jnp.float32), kka.astype(jnp.float32),
                        va.astype(jnp.float32), causal=True)
    for sd in ("f32", "bf16"):
        for exp2 in (False, True):
            cfg = FlashConfig(softmax_dtype=sd, exp2=exp2)
            out, _ = jax.jit(lambda a, b, c, cfg=cfg: flash_fwd(
                a, b, c, causal=True, config=cfg))(qa, kka, va)
            e = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            print(f"accuracy sd={sd} exp2={int(exp2)}: maxerr {e:.2e}",
                  flush=True)

    # perf at the 8B prefill shape
    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2

    for bq, bk, sd, exp2 in (
        (1024, 1024, "f32", False),
        (1024, 1024, "bf16", False),
        (1024, 1024, "bf16", True),
        (1024, 2048, "bf16", False),
        (2048, 1024, "bf16", False),
        (512, 1024, "bf16", False),
    ):
        cfg = FlashConfig(block_q=bq, block_k=bk, softmax_dtype=sd, exp2=exp2)

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
            t = paired(mk(4), mk(8), 4)
            tf = flops / t / 1e12
            print(f"bq={bq} bk={bk} sd={sd} exp2={int(exp2)}: {t*1e3:.2f} ms, "
                  f"{tf:.1f} TF/s, {tf/197:.3f} of peak", flush=True)
        except Exception as e:
            print(f"bq={bq} bk={bk} sd={sd}: FAIL {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
