"""Round-2r: clamped-softmax forward mode vs online at the 8B prefill shape.

The softmax probe (tune_r2o/p) showed the running-max/rescale stats pass is
the forward's remaining bottleneck (stats-free probe hit 0.923 of peak vs
0.608 online).  softmax_mode="clamped" removes the stats pass while keeping
correct math for in-contract scores; this measures what that buys in the
real causal kernel and gates on oracle accuracy.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2r.py
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

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2

    # accuracy gate at S=2048 vs fp32 oracle
    Sa = 2048
    qa = q[:, :Sa].astype(jnp.float32).astype(jnp.bfloat16)
    ka, va = k[:, :Sa], v[:, :Sa]
    oracle = mha_reference(
        qa.astype(jnp.float32), ka.astype(jnp.float32), va.astype(jnp.float32),
        causal=True,
    )

    configs = [
        ("online f32 1024x1024", FlashConfig(block_q=1024, block_k=1024)),
        ("clamped f32 1024x1024",
         FlashConfig(block_q=1024, block_k=1024, softmax_mode="clamped")),
        ("clamped bf16 1024x1024",
         FlashConfig(block_q=1024, block_k=1024, softmax_mode="clamped",
                     softmax_dtype="bf16")),
        ("clamped f32 512x1024",
         FlashConfig(block_q=512, block_k=1024, softmax_mode="clamped")),
        ("clamped f32 1024x2048",
         FlashConfig(block_q=1024, block_k=2048, softmax_mode="clamped")),
        ("clamped f32 2048x1024",
         FlashConfig(block_q=2048, block_k=1024, softmax_mode="clamped")),
    ]

    for name, cfg in configs:
        def mk(m, cfg=cfg):
            @jax.jit
            def f(q_, k_, v_):
                def body(i, x):
                    o, _ = flash_fwd(x, k_, v_, causal=True, config=cfg)
                    return o.astype(jnp.bfloat16)

                y = jax.lax.fori_loop(0, m, body, q_)
                return jnp.sum(y.astype(jnp.float32))

            float(f(q, k, v)); float(f(q, k, v))
            return lambda: float(f(q, k, v))

        try:
            out, _ = jax.jit(
                lambda a, b, c, cfg=cfg: flash_fwd(a, b, c, causal=True,
                                                   config=cfg))(qa, ka, va)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - oracle)))
            t = paired(mk(2), mk(4), 2)
            tf = flops / t / 1e12
            print(f"{name}: {t*1e3:.2f} ms, {tf:.1f} TF/s, "
                  f"{tf/197:.3f} of peak, maxerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
