"""Round-3: append formulation shootout IN CONTEXT (append + decode kernel
per layer, per-layer cache arrays).  The r3 int8 trace shows the vmap-DUS
append lowering to per-batch slice/DUS chains costing ~131 us/layer.

Variants (per-layer arrays everywhere):
  vmapdus  — shipped: vmap dynamic_update_slice over batch, scales [B,Hk,S,1]
  scatter  — indexed .at[b,: ,t,:].set scatter, scales [B,Hk,S,1]
  lane     — scatter K/V; scales stored lane-dense [B,Hk,1,S] and scattered

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r3_append2_probe.py
"""

import time

import numpy as np


def main():
    from flash_attn_tpu.utils.tpu_connect import ensure_tpu

    ensure_tpu()
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    L, B, H, Hk, S, D = 2, 8, 32, 8, 8192, 128
    mode = "int8"
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    newk = jax.random.normal(key, (B, 1, Hk, D), jnp.bfloat16)
    b_idx = jnp.arange(B)

    def mk(scale_lane):
        k = tuple(jnp.zeros((B, Hk, S, D), jnp.int8) for _ in range(L))
        v = tuple(jnp.zeros((B, Hk, S, D), jnp.int8) for _ in range(L))
        sshape = (B, Hk, 1, S) if scale_lane else (B, Hk, S, 1)
        ks = tuple(jnp.ones(sshape, jnp.float32) for _ in range(L))
        vs = tuple(jnp.ones(sshape, jnp.float32) for _ in range(L))
        return (k, v, ks, vs, jnp.full((B,), S - 512, jnp.int32))

    def app_vmapdus(buf, val, length):  # val [B,Hk,c]
        val = val[:, :, None].astype(buf.dtype)
        return jax.vmap(
            lambda c, n, st: jax.lax.dynamic_update_slice(c, n, (0, st, 0))
        )(buf, val, length)

    def app_scatter(buf, val, length):  # buf [B,Hk,S,c]; val [B,Hk,c]
        return buf.at[b_idx, :, length, :].set(
            val.astype(buf.dtype), unique_indices=True, mode="drop"
        )

    def app_scatter_lane(buf, val, length):  # buf [B,Hk,1,S]; val [B,Hk]
        return buf.at[b_idx, :, 0, length].set(
            val, unique_indices=True, mode="drop"
        )

    def make_step(variant):
        def step(cc, x, nk):
            k, v, ksc, vsc, length = cc
            kq, ks_, vq, vs_ = quantize_kv(nk, nk, mode)
            kq, vq = kq[:, 0], vq[:, 0]       # [B,Hk,D]
            ks_, vs_ = ks_[:, 0], vs_[:, 0]   # [B,Hk,1]
            acc = x
            k, v, ksc, vsc = list(k), list(v), list(ksc), list(vsc)
            for i in range(L):
                if variant == "vmapdus":
                    k[i] = app_vmapdus(k[i], kq, length)
                    v[i] = app_vmapdus(v[i], vq, length)
                    ksc[i] = app_vmapdus(ksc[i], ks_, length)
                    vsc[i] = app_vmapdus(vsc[i], vs_, length)
                    kse, vse = ksc[i], vsc[i]
                elif variant == "scatter":
                    k[i] = app_scatter(k[i], kq, length)
                    v[i] = app_scatter(v[i], vq, length)
                    ksc[i] = app_scatter(ksc[i], ks_, length)
                    vsc[i] = app_scatter(vsc[i], vs_, length)
                    kse, vse = ksc[i], vsc[i]
                else:  # lane
                    k[i] = app_scatter(k[i], kq, length)
                    v[i] = app_scatter(v[i], vq, length)
                    ksc[i] = app_scatter_lane(ksc[i], ks_[..., 0], length)
                    vsc[i] = app_scatter_lane(vsc[i], vs_[..., 0], length)
                    # feed legacy [B,Hk,S,1] view so flash_decode matches
                    kse = jnp.swapaxes(ksc[i], 2, 3)
                    vse = jnp.swapaxes(vsc[i], 2, 3)
                o = flash_decode(acc[:, :, :D], k[i], v[i], k_scale=kse,
                                 v_scale=vse, kv_length=length + 1,
                                 kv_layout="bhsd")
                acc = acc + o.astype(acc.dtype)
            return (tuple(k), tuple(v), tuple(ksc), tuple(vsc), length + 1), acc

        return step

    def chain(variant, m):
        step_fn = make_step(variant)
        init = mk(variant == "lane")

        @jax.jit
        def f(cache, x, nk):
            def body(carry, _):
                c, x = carry
                c, x = step_fn(c, x, nk)
                return (c, x), None

            (c, x), _ = jax.lax.scan(body, (cache, x), None, length=m)
            return jnp.sum(x.astype(jnp.float32))

        float(f(init, q, newk))
        float(f(init, q, newk))
        return lambda: float(f(init, q, newk))

    import sys

    variants = sys.argv[1:] or ["scatter", "lane"]
    for name in variants:
        m = 32
        r1, r2 = chain(name, m), chain(name, 2 * m)
        t_m, t_2m = [], []
        for _ in range(5):
            t0 = time.perf_counter(); r1(); t_m.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); r2(); t_2m.append(time.perf_counter() - t0)
        per = (np.median(t_2m) - np.median(t_m)) / m
        print(f"{name:>8}: {per * 1e6:8.1f} us/step ({L} layers: append+decode)")


if __name__ == "__main__":
    main()
