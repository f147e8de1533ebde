"""Round-3: KVCache.append formulations, measured at the 8B decode shape.

The r3 decode trace attributes ~1 ms/layer/step to slice_bitcast/DUS fusions
from append's read-modify-write of whole [B,Hk,S,D] layer slabs.  Candidates:

  current  — k[layer] slice -> vmap DUS -> .at[layer].set  (r2 shipped)
  scatter  — one indexed scatter on the full [L,B,Hk,S,D] buffer
  fused    — scatter, but quantize+transpose inlined (no intermediate names)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r3_append_probe.py
"""

import time

import numpy as np


def main():
    from flash_attn_tpu.utils.tpu_connect import ensure_tpu

    ensure_tpu()
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.kv_cache import KVCache
    from flash_attn_tpu.ops.quant import quantize_kv

    L, B, Hk, S, D = 2, 8, 8, 8192, 128
    mode = "int8"
    cache = KVCache.create(L, B, S, Hk, D, dtype=jnp.bfloat16, mode=mode)
    cache = cache.advance(S - 512)
    key = jax.random.PRNGKey(0)
    newk = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)

    def append_scatter(cache, layer, new_k, new_v):
        kq, ks, vq, vs = quantize_kv(new_k, new_v, cache.mode)
        b_idx = jnp.arange(B)
        T = new_k.shape[1]
        t_idx = cache.length[:, None] + jnp.arange(T)[None]  # [B, T]

        def put(buf, val):  # val [B, T, Hk, c] -> buf[layer, b, :, t, :]
            return buf.at[layer, b_idx[:, None], :, t_idx, :].set(
                val.astype(buf.dtype), mode="drop", unique_indices=True,
            )

        k = put(cache.k, kq)
        v = put(cache.v, vq)
        ksn, vsn = cache.k_scale, cache.v_scale
        if cache.mode != "none":
            ksn = put(cache.k_scale, ks)
            vsn = put(cache.v_scale, vs)
        return KVCache(k, v, ksn, vsn, cache.length, cache.mode)

    def chain(append_fn, m):
        @jax.jit
        def f(cache, x):
            def step(carry, _):
                c, x = carry
                # data-dependent new K/V so steps can't fold
                nk = x + c.length[0].astype(x.dtype) * 0
                c = append_fn(c, 0, nk, nk)
                c = append_fn(c, 1, nk, nk)
                c = c.advance(1)
                return (c, x * 1.000001), None

            (c, x), _ = jax.lax.scan(step, (cache, x), None, length=m)
            return jnp.sum(x.astype(jnp.float32)) + jnp.sum(c.length)

        float(f(cache, newk))
        float(f(cache, newk))
        return lambda: float(f(cache, newk))

    def cur_append(c, layer, nk, nv):
        return c.append(layer, nk, nv)

    results = {}
    for name, fn in (("current", cur_append), ("scatter", append_scatter)):
        t_m, t_2m = [], []
        m = 64
        r1, r2 = chain(fn, m), chain(fn, 2 * m)
        for _ in range(5):
            t0 = time.perf_counter(); r1(); t_m.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); r2(); t_2m.append(time.perf_counter() - t0)
        per = (np.median(t_2m) - np.median(t_m)) / m
        results[name] = per
        print(f"{name:>8}: {per * 1e6:8.1f} us/step (2 layers, k+v+scales)")

    print({k: round(v * 1e6, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
