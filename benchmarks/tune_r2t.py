"""Round-2t: one-session measurement of the late round-2 features —
(a) in-kernel q-side RoPE vs outside rotation at the 8B prefill shape,
(b) packed-pair fp8 paged decode vs the per-element path and vs int8 pages,
at the 8B/8k decode shape.

Run: PALLAS_AXON_POOL_IPS= python tools/run_on_tpu.py benchmarks/tune_r2t.py
"""

import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def rope_sweep():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import flash_fwd
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hk, D), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    cos, sin = rope_cos_sin(pos, D, 500000.0)
    k_rot = rope_rotate(k, cos, sin)
    flops = 4 * B * H * S * S * D / 2

    variants = {
        # what the model layer used to do: materialize R(q) then attend
        "rope outside (materialized q)": lambda q_: flash_fwd(
            rope_rotate(q_, cos, sin), k_rot, v, causal=True
        )[0],
        # in-kernel rotation: q block rotated at load time
        "rope in-kernel": lambda q_: flash_fwd(
            q_, k_rot, v, causal=True, rope_cos=cos, rope_sin=sin
        )[0],
        # floor: no rope at all (kernel-only time)
        "no rope (floor)": lambda q_: flash_fwd(q_, k_rot, v, causal=True)[0],
    }
    for name, fn in variants.items():
        def mk(m, fn=fn):
            @jax.jit
            def f(q_):
                def body(i, x):
                    return fn(x).astype(jnp.bfloat16)

                return jnp.sum(jax.lax.fori_loop(0, m, body, q_).astype(jnp.float32))

            float(f(q)); float(f(q))
            return lambda: float(f(q))

        t = paired(mk(2), mk(4), 2)
        print(f"{name}: {t*1e3:.2f} ms, {flops/t/1e12:.1f} TF/s attn-equiv",
              flush=True)


def paged_fp8_sweep():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.paged import PagedKVPool
    from flash_attn_tpu.ops.decode import _permute_scale_lanes
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, Hk, H, D = 8, 8192, 8, 32, 128
    key = jax.random.PRNGKey(4)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, H, D), jnp.bfloat16)

    for mode in ("int8", "fp8"):
        for page in (256, 512, 1024):
            per_seq = S // page
            num_pages = B * per_seq + 1
            pool = PagedKVPool.create(
                1, num_pages, page, B, per_seq, Hk, D,
                dtype=jnp.bfloat16, mode=mode,
            )
            for b in range(B):
                pool = pool.assign_pages(
                    b, list(range(1 + b * per_seq, 1 + (b + 1) * per_seq))
                )
            kq, ks, vq, vs = quantize_kv(k, v, mode)
            kp = jnp.swapaxes(kq, 1, 2).reshape(B, Hk, per_seq, page, D)
            vp = jnp.swapaxes(vq, 1, 2).reshape(B, Hk, per_seq, page, D)
            kp = jnp.moveaxis(kp, 2, 1).reshape(B * per_seq, Hk, page, D)
            vp = jnp.moveaxis(vp, 2, 1).reshape(B * per_seq, Hk, page, D)
            ksl = jnp.swapaxes(ks[..., 0], 1, 2).reshape(B, Hk, per_seq, 1, page)
            vsl = jnp.swapaxes(vs[..., 0], 1, 2).reshape(B, Hk, per_seq, 1, page)
            ksl = jnp.moveaxis(ksl, 2, 1).reshape(B * per_seq, Hk, 1, page)
            vsl = jnp.moveaxis(vsl, 2, 1).reshape(B * per_seq, Hk, 1, page)
            permuted = pool.scales_permuted
            if permuted:
                ksl = _permute_scale_lanes(ksl, page)
                vsl = _permute_scale_lanes(vsl, page)
            pool = pool._replace(
                k_pages=(pool.k_pages[0].at[1:].set(kp),),
                v_pages=(pool.v_pages[0].at[1:].set(vp),),
                k_scale=(pool.k_scale[0].at[1:].set(ksl),),
                v_scale=(pool.v_scale[0].at[1:].set(vsl),),
                length=jnp.full((B,), S, jnp.int32),
            )
            consts = (
                pool.k_pages[0], pool.v_pages[0], pool.k_scale[0],
                pool.v_scale[0], pool.block_table, pool.length,
            )

            def mk(m):
                @jax.jit
                def f(q_, kpg, vpg, kspg, vspg, tbl, lens):
                    def body(i, x):
                        return paged_flash_decode(
                            x, kpg, vpg, tbl, lens, k_scale=kspg,
                            v_scale=vspg, scales_permuted=permuted,
                        ).astype(jnp.bfloat16)

                    y = jax.lax.fori_loop(0, m, body, q_)
                    return jnp.sum(y.astype(jnp.float32))

                float(f(q, *consts)); float(f(q, *consts))
                return lambda: float(f(q, *consts))

            t = paired(mk(8), mk(16), 8)
            kv_bytes = 2 * B * S * Hk * (D + 4)
            frac = kv_bytes / 819e9 / t
            print(f"paged {mode} page={page}: {t*1e6:.1f} us, "
                  f"{frac:.3f} of HBM roofline", flush=True)


if __name__ == "__main__":
    import jax

    print("device:", jax.devices()[0], flush=True)
    rope_sweep()
    paged_fp8_sweep()
