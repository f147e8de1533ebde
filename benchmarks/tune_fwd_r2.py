"""FA2-forward tuning, round 2 (VERDICT item 5: 51% -> >=70% of peak at the
8B prefill shape).  Sweeps block shapes and measures the mask-skip fast path.

Run: python tools/run_on_tpu.py benchmarks/tune_fwd_r2.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2
    peak = 197e12

    def run(cfg, n=8, iters=5, tag=""):
        @jax.jit
        def chain(q_, k_, v_, m):
            def body(i, c):
                return flash_fwd(c, k_, v_, causal=True, config=cfg)[0]

            y = jax.lax.fori_loop(0, m, body, q_)
            return jnp.sum(y.astype(jnp.float32))

        import functools

        def mk(m):
            f = jax.jit(functools.partial(chain, m=m))
            float(f(q, k, v))
            float(f(q, k, v))
            return f

        try:
            f1 = mk(n)
            f2 = mk(2 * n)
        except Exception as e:
            print(f"{tag} {cfg.block_q}x{cfg.block_k}: COMPILE FAIL {repr(e)[:120]}",
                  flush=True)
            return None
        t1s, t2s = [], []
        for _ in range(iters):
            t0 = time.perf_counter(); float(f1(q, k, v)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f2(q, k, v)); t2s.append(time.perf_counter() - t0)
        t = (float(np.median(t2s)) - float(np.median(t1s))) / n
        if t <= 0:
            print(f"{tag} {cfg.block_q}x{cfg.block_k}: degenerate sample", flush=True)
            return None
        tf = flops / t / 1e12
        print(
            f"{tag} bq={cfg.block_q} bk={cfg.block_k}: {t*1e3:.2f} ms, "
            f"{tf:.1f} TF/s ({tf/peak*1e12*100:.0f}% peak)",
            flush=True,
        )
        return t

    print("devices:", jax.devices(), flush=True)
    results = {}
    for bq, bk in [
        (512, 2048),   # round-1 default
        (512, 1024),
        (1024, 1024),
        (1024, 2048),
        (256, 2048),
        (512, 4096),
        (1024, 4096),
        (2048, 2048),
    ]:
        t = run(FlashConfig(block_q=bq, block_k=bk), tag="sweep")
        if t:
            results[(bq, bk)] = t
    if results:
        best = min(results, key=results.get)
        print(f"BEST: bq={best[0]} bk={best[1]} "
              f"{flops/results[best]/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
