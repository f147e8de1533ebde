"""Round-3: stacked [L,B,Hk,S,D] cache vs per-layer arrays, with the decode
kernel consuming the cache (the real pattern).  The stacked layout forces a
64 MB slice per layer per step to feed pallas_call and defeats in-place
append; per-layer arrays need no slice at all.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r3_layercache_probe.py
"""

import time

import numpy as np


def main():
    from flash_attn_tpu.utils.tpu_connect import ensure_tpu

    ensure_tpu()
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.kv_cache import KVCache
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    L, B, H, Hk, S, D = 2, 8, 32, 8, 8192, 128
    mode = "int8"
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    newk = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)

    # --- variant A: current stacked KVCache ---
    cacheA = KVCache.create(L, B, S, Hk, D, dtype=jnp.bfloat16, mode=mode)
    cacheA = cacheA.advance(S - 512)

    def stepA(c, x, nk):
        acc = x
        for i in range(L):
            c = c.append(i, nk, nk)
            kc, vc, ks, vs = c.layer(i)
            o = flash_decode(acc[:, :, :D], kc, vc, k_scale=ks, v_scale=vs,
                             kv_length=c.length + 1, kv_layout="bhsd")
            acc = acc + o.astype(acc.dtype)
        return c.advance(1), acc

    # --- variant B: per-layer arrays (tuple pytree) ---
    def make_list_cache():
        k = tuple(jnp.zeros((B, Hk, S, D), jnp.int8) for _ in range(L))
        v = tuple(jnp.zeros((B, Hk, S, D), jnp.int8) for _ in range(L))
        ks = tuple(jnp.ones((B, Hk, S, 1), jnp.float32) for _ in range(L))
        vs = tuple(jnp.ones((B, Hk, S, 1), jnp.float32) for _ in range(L))
        length = jnp.full((B,), S - 512, jnp.int32)
        return (k, v, ks, vs, length)

    def append_layer(buf, val, length):
        # buf [B,Hk,S,c]; val [B,1,Hk,c] -> [B,Hk,1,c] at (b,:,length[b],:)
        val = jnp.swapaxes(val, 1, 2).astype(buf.dtype)
        return jax.vmap(
            lambda c, n, st: jax.lax.dynamic_update_slice(c, n, (0, st, 0))
        )(buf, val, length)

    def stepB(cc, x, nk):
        k, v, ksc, vsc, length = cc
        kq, ks_, vq, vs_ = quantize_kv(nk, nk, mode)
        acc = x
        k, v, ksc, vsc = list(k), list(v), list(ksc), list(vsc)
        for i in range(L):
            k[i] = append_layer(k[i], kq, length)
            v[i] = append_layer(v[i], vq, length)
            ksc[i] = append_layer(ksc[i], ks_, length)
            vsc[i] = append_layer(vsc[i], vs_, length)
            o = flash_decode(acc[:, :, :D], k[i], v[i], k_scale=ksc[i],
                             v_scale=vsc[i], kv_length=length + 1,
                             kv_layout="bhsd")
            acc = acc + o.astype(acc.dtype)
        return (tuple(k), tuple(v), tuple(ksc), tuple(vsc), length + 1), acc

    def chain(step_fn, init_cache, m):
        @jax.jit
        def f(cache, x, nk):
            def body(carry, _):
                c, x = carry
                c, x = step_fn(c, x, nk)
                return (c, x), None

            (c, x), _ = jax.lax.scan(body, (cache, x), None, length=m)
            return jnp.sum(x.astype(jnp.float32))

        float(f(init_cache, q, newk))
        float(f(init_cache, q, newk))
        return lambda: float(f(init_cache, q, newk))

    for name, step_fn, init in (
        ("stacked", stepA, cacheA),
        ("perlayer", stepB, make_list_cache()),
    ):
        m = 32
        r1, r2 = chain(step_fn, init, m), chain(step_fn, init, 2 * m)
        t_m, t_2m = [], []
        for _ in range(5):
            t0 = time.perf_counter(); r1(); t_m.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); r2(); t_2m.append(time.perf_counter() - t0)
        per = (np.median(t_2m) - np.median(t_m)) / m
        print(f"{name:>9}: {per * 1e6:8.1f} us/step ({L} layers: append+decode)")


if __name__ == "__main__":
    main()
