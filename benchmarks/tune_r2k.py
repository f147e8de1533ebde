"""Round-2k: locate the remaining FA2-forward gap (123 TF/s = 62.5% at
1024x1024+split vs the 0.70 target).

(a) non-causal at the same shape = pipeline ceiling with zero mask/
    predication work — tells us whether the gap is causal bookkeeping or
    the inner pipeline;
(b) causal with raised vmem_limit_bytes (the bq=2048 compile failures smell
    like a VMEM cap, and more VMEM can deepen double buffering);
(c) 2048-wide blocks under the raised cap.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2k.py
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
    peak = 197e12

    def run(label, causal, cfg, flops):
        def mk(m):
            @jax.jit
            def f(q_, k_, v_):
                def body(i, c):
                    o, _ = flash_fwd(c, k_, v_, causal=causal, config=cfg)
                    return o.astype(jnp.bfloat16)

                y = jax.lax.fori_loop(0, m, body, q_)
                return jnp.sum(y.astype(jnp.float32))

            float(f(q, k, v)); float(f(q, k, v))
            return lambda: float(f(q, k, v))

        try:
            t = paired(mk(4), mk(8), 4)
            tf = flops / t / 1e12
            print(f"{label}: {t*1e3:.2f} ms, {tf:.1f} TF/s, "
                  f"{tf/197:.3f} of peak", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {repr(e)[:160]}", flush=True)

    fl_causal = 4 * B * H * S * S * D / 2
    fl_full = 4 * B * H * S * S * D

    V128 = 128 * 1024 * 1024
    run("noncausal 1024x1024", False,
        FlashConfig(block_q=1024, block_k=1024), fl_full)
    run("noncausal 512x1024", False,
        FlashConfig(block_q=512, block_k=1024), fl_full)
    run("causal 1024x1024 split vmem=128M", True,
        FlashConfig(block_q=1024, block_k=1024, split_causal_mask=True,
                    vmem_limit_bytes=V128), fl_causal)
    run("causal 2048x1024 split vmem=128M", True,
        FlashConfig(block_q=2048, block_k=1024, split_causal_mask=True,
                    vmem_limit_bytes=V128), fl_causal)
    run("causal 1024x2048 split vmem=128M", True,
        FlashConfig(block_q=1024, block_k=2048, split_causal_mask=True,
                    vmem_limit_bytes=V128), fl_causal)
    run("noncausal 1024x1024 vmem=128M", False,
        FlashConfig(block_q=1024, block_k=1024, vmem_limit_bytes=V128),
        fl_full)


if __name__ == "__main__":
    main()
