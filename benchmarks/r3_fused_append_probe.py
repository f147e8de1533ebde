"""r3: fused quantize+append + lane-dense pre-permuted scales — on-chip
correctness and composed Llama-8B decode perf (int8 vs fp8 KV).

Prior numbers (commit e3b0d46, per-layer cache arrays, pre-fused-append):
int8 620.0 us/layer (400.0 tok/s), fp8 821.1 us/layer (300.6 tok/s).
Target (VERDICT r2 item 2): fp8 end-to-end >= int8.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.models import llama
from flash_attn_tpu.ops.decode import flash_decode


def correctness():
    B, Hk, H, S, D = 4, 4, 8, 4096, 128
    for mode in ("int8", "fp8", "none"):
        cache = KVCache.create(1, B, S, Hk, D, mode=mode)
        nk = jax.random.normal(jax.random.PRNGKey(0), (B, 1, Hk, D), jnp.bfloat16)
        nv = jax.random.normal(jax.random.PRNGKey(1), (B, 1, Hk, D), jnp.bfloat16)
        length = jnp.asarray([0, 5, 2047, 2048], jnp.int32)
        cache = KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                        length, cache.mode, cache.scale_perm_chunk)

        @jax.jit
        def app_dec(c, nk, nv):
            c = c.append(0, nk, nv)
            kc, vc, ks, vs = c.layer(0)
            q = nk[:, 0].astype(jnp.bfloat16)  # [B, Hk, D] as H=Hk query
            return flash_decode(
                q, kc, vc, k_scale=ks, v_scale=vs, kv_length=c.length + 1,
                kv_layout="bhsd", **c.scale_args(),
            )

        out = app_dec(cache, nk, nv)
        # oracle: same cache content, jnp path
        c2 = cache.append(0, nk, nv)
        kc, vc, ks, vs = c2.layer(0)
        want = flash_decode(
            nk[:, 0].astype(jnp.bfloat16), kc, vc, k_scale=ks, v_scale=vs,
            kv_length=c2.length + 1, kv_layout="bhsd", use_kernel=False,
            **c2.scale_args(),
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"mode={mode}: perm_chunk={cache.scale_perm_chunk} max err {err:.5f}", flush=True)
        assert err < 3e-2, (mode, err)


def median_time(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def layer_time(kv_mode):
    B, S = 8, 8192

    def step_time(num_layers):
        cfg = llama.LlamaConfig(
            vocab_size=32768, hidden=4096, intermediate=14336,
            num_layers=num_layers, num_heads=32, num_kv_heads=8,
            head_dim=128, max_position=S, rope_theta=500000.0,
            dtype="bfloat16",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        params = llama.quantize_weights(params, mode="int8")
        cache = llama.make_cache(cfg, B, S, mode=kv_mode)
        cache = cache.advance(S - 512)
        tok0 = jnp.ones((B,), jnp.int32)

        def chained(m):
            @jax.jit
            def f(params_, tok, cache_):
                def step(carry, _):
                    tok_, c = carry
                    logits, c = llama.decode_step(params_, tok_, cfg, c)
                    return (jnp.argmax(logits, -1).astype(jnp.int32), c), None

                (tok, cache_), _ = jax.lax.scan(step, (tok, cache_), None, length=m)
                return jnp.sum(tok)

            float(f(params, tok0, cache))
            float(f(params, tok0, cache))
            return lambda: float(f(params, tok0, cache))

        n = 16
        t_n = median_time(chained(n), 5)
        t_2n = median_time(chained(2 * n), 5)
        return max((t_2n - t_n) / n, 1e-9)

    t1 = step_time(1)
    t2 = step_time(2)
    t_layer = max(t2 - t1, 1e-9)
    t_nl = max(t1 - t_layer, 0.0)
    t32 = 32 * t_layer + t_nl
    print(f"{kv_mode}: layer {t_layer*1e6:.1f} us, 32L step {t32*1e3:.2f} ms, "
          f"{B/t32:.1f} tok/s/chip", flush=True)


if __name__ == "__main__":
    correctness()
    for m in ("int8", "fp8"):
        layer_time(m)
