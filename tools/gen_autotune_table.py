"""Generate the shipped autotune table (flash_attn_tpu/utils/
autotune_table.json): measure candidate FlashConfigs for the common
(seq, head_dim) grid on the live chip and record winners per chip kind.

Run on real hardware:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/gen_autotune_table.py

The table is keyed exactly like the live autotune cache
(utils/autotune._key, "bwd:"-prefixed for backward), nested under
chip_kind(), so get_config/get_bwd_config pick it up for users with a cold
cache (SURVEY §5 config system: ship the measured table).
"""

import json
import os
import sys
import time
from dataclasses import asdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def main():
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd
    from flash_attn_tpu.utils import autotune
    from flash_attn_tpu.utils.profiling import chip_kind

    chip = chip_kind()
    out_path = os.path.join(
        REPO, "flash_attn_tpu", "utils", "autotune_table.json"
    )
    table = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            table = json.load(f)
    entry = table.setdefault(chip, {})

    H, HK = 16, 4  # GQA; block choice is insensitive to head count

    # --- forward sweep ---
    for S in (1024, 2048, 8192):
        for D in (64, 128):
            key = jax.random.PRNGKey(0)
            q = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)
            k = jax.random.normal(key, (1, S, HK, D), jnp.bfloat16)
            v = jax.random.normal(key, (1, S, HK, D), jnp.bfloat16)
            cands = [
                FlashConfig(block_q=bq, block_k=bk)
                for bq in (256, 512, 1024)
                for bk in (512, 1024)
                if bq <= S and bk <= S
            ]
            best, best_t = None, float("inf")
            for cfg in cands:
                try:
                    @jax.jit
                    def f(q_, m=4, cfg=cfg):
                        def body(i, c):
                            o, _ = flash_fwd(c, k, v, causal=True, config=cfg)
                            return o.astype(jnp.bfloat16)

                        return jnp.sum(
                            jax.lax.fori_loop(0, m, body, q_).astype(jnp.float32)
                        )

                    @jax.jit
                    def f2(q_):
                        return f(q_, 8)

                    float(f(q)); float(f2(q))
                    t = paired(lambda: float(f(q)), lambda: float(f2(q)), 4)
                except Exception as e:
                    print(f"fwd S={S} D={D} {cfg.block_q}x{cfg.block_k}: "
                          f"FAIL {repr(e)[:80]}", flush=True)
                    continue
                print(f"fwd S={S} D={D} {cfg.block_q}x{cfg.block_k}: "
                      f"{t*1e3:.2f} ms", flush=True)
                if t < best_t:
                    best, best_t = cfg, t
            if best is not None:
                kkey = autotune._key(S, S, D, "bfloat16")
                entry[kkey] = asdict(best)
                print(f"fwd winner {kkey}: {entry[kkey]}", flush=True)

    # --- backward sweep (8B shape + mid shape) ---
    for S, D in ((2048, 128), (8192, 128)):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)
        k = jax.random.normal(key, (1, S, HK, D), jnp.bfloat16)
        v = jax.random.normal(key, (1, S, HK, D), jnp.bfloat16)
        dout = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)
        out, lse = jax.jit(
            lambda a, b, c: flash_fwd(a, b, c, causal=True)
        )(q, k, v)
        best, best_t = None, float("inf")
        for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 512)):
            if bq > S or bk > S:
                continue
            cfg = FlashConfig(block_q=bq, block_k=bk)
            try:
                @jax.jit
                def g(dout_, m=2, cfg=cfg):
                    def body(i, c):
                        dq, _, _ = flash_bwd(q, k, v, out, lse, c,
                                             causal=True, config=cfg)
                        return dq.astype(jnp.bfloat16)

                    return jnp.sum(
                        jax.lax.fori_loop(0, m, body, dout_).astype(jnp.float32)
                    )

                @jax.jit
                def g2(dout_):
                    return g(dout_, 4)

                float(g(dout)); float(g2(dout))
                t = paired(lambda: float(g(dout)), lambda: float(g2(dout)), 2)
            except Exception as e:
                print(f"bwd S={S} {bq}x{bk}: FAIL {repr(e)[:80]}", flush=True)
                continue
            print(f"bwd S={S} {bq}x{bk}: {t*1e3:.2f} ms", flush=True)
            if t < best_t:
                best, best_t = cfg, t
        if best is not None:
            kkey = "bwd:" + autotune._key(S, S, D, "bfloat16")
            entry[kkey] = asdict(best)
            print(f"bwd winner {kkey}: {entry[kkey]}", flush=True)

    # --- contiguous decode sweep (block_k per KV dtype) ---
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, Hk, Hq, D = 8, 8192, 8, 32, 128
    key = jax.random.PRNGKey(2)
    kf = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    vf = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    qd = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    for mode in ("none", "int8", "fp8"):
        if mode == "none":
            kq, ks, vq, vs = kf, None, vf, None
        else:
            kq, ks, vq, vs = quantize_kv(kf, vf, mode)
        # production layout: heads-major cache + lane-dense scales
        kq = jnp.swapaxes(kq, 1, 2)
        vq = jnp.swapaxes(vq, 1, 2)
        ks = None if ks is None else jnp.swapaxes(ks, 1, 2)
        vs = None if vs is None else jnp.swapaxes(vs, 1, 2)
        best, best_t = None, float("inf")
        for bk in (512, 1024, 2048, 4096):
            try:
                @jax.jit
                def f(q_, m=8, bk=bk):
                    def body(i, c):
                        return flash_decode(
                            c, kq, vq, k_scale=ks, v_scale=vs,
                            kv_layout="bhsd", block_k=bk,
                        ).astype(jnp.bfloat16)

                    return jnp.sum(
                        jax.lax.fori_loop(0, m, body, q_).astype(jnp.float32)
                    )

                @jax.jit
                def f2(q_):
                    return f(q_, 16)

                float(f(qd)); float(f2(qd))
                t = paired(lambda: float(f(qd)), lambda: float(f2(qd)), 8)
            except Exception as e:
                print(f"dec {mode} bk={bk}: FAIL {repr(e)[:80]}", flush=True)
                continue
            print(f"dec {mode} bk={bk}: {t*1e6:.1f} us", flush=True)
            if t < best_t:
                best, best_t = bk, t
        if best is not None:
            dt = str(kq.dtype)
            entry[f"dec:{dt}"] = {"block_k": best}
            print(f"dec winner {dt}: bk={best}", flush=True)

    # --- paged decode sweep (rows-per-grid-step per page size + dtype) ---
    from flash_attn_tpu.engine.paged import PagedKVPool
    from flash_attn_tpu.ops.decode import _permute_scale_lanes
    from flash_attn_tpu.ops.paged_decode import paged_flash_decode

    for page in (256, 512):
        per_seq = S // page
        num_pages = B * per_seq + 1
        for mode in ("none", "int8", "fp8"):
            pool = PagedKVPool.create(
                1, num_pages, page, B, per_seq, Hk, D,
                dtype=jnp.bfloat16, mode=mode,
            )
            for b in range(B):
                pool = pool.assign_pages(
                    b, list(range(1 + b * per_seq, 1 + (b + 1) * per_seq))
                )
            if mode == "none":
                kq, ks, vq, vs = kf, None, vf, None
            else:
                kq, ks, vq, vs = quantize_kv(kf, vf, mode)
            kp = jnp.swapaxes(kq, 1, 2).reshape(B, Hk, per_seq, page, D)
            vp = jnp.swapaxes(vq, 1, 2).reshape(B, Hk, per_seq, page, D)
            kp = jnp.moveaxis(kp, 2, 1).reshape(B * per_seq, Hk, page, D)
            vp = jnp.moveaxis(vp, 2, 1).reshape(B * per_seq, Hk, page, D)
            repl = {"length": jnp.full((B,), S, jnp.int32)}
            repl["k_pages"] = (pool.k_pages[0].at[1:].set(kp),)
            repl["v_pages"] = (pool.v_pages[0].at[1:].set(vp),)
            if ks is not None:
                ksl = jnp.swapaxes(ks[..., 0], 1, 2).reshape(
                    B, Hk, per_seq, 1, page)
                vsl = jnp.swapaxes(vs[..., 0], 1, 2).reshape(
                    B, Hk, per_seq, 1, page)
                ksl = jnp.moveaxis(ksl, 2, 1).reshape(B * per_seq, Hk, 1, page)
                vsl = jnp.moveaxis(vsl, 2, 1).reshape(B * per_seq, Hk, 1, page)
                if pool.scales_permuted:
                    ksl = _permute_scale_lanes(ksl, page)
                    vsl = _permute_scale_lanes(vsl, page)
                repl["k_scale"] = (pool.k_scale[0].at[1:].set(ksl),)
                repl["v_scale"] = (pool.v_scale[0].at[1:].set(vsl),)
            pool = pool._replace(**repl)
            permuted = pool.scales_permuted
            ksc = pool.k_scale[0] if ks is not None else None
            vsc = pool.v_scale[0] if vs is not None else None
            best, best_t = None, float("inf")
            for rows in (512, 1024, 2048, 4096):
                if rows < page:
                    continue
                try:
                    @jax.jit
                    def f(q_, m=8, rows=rows):
                        def body(i, c):
                            return paged_flash_decode(
                                c, pool.k_pages[0], pool.v_pages[0],
                                pool.block_table, pool.length,
                                k_scale=ksc, v_scale=vsc,
                                scales_permuted=permuted,
                                target_rows=rows,
                            ).astype(jnp.bfloat16)

                        return jnp.sum(
                            jax.lax.fori_loop(0, m, body, q_).astype(
                                jnp.float32)
                        )

                    @jax.jit
                    def f2(q_):
                        return f(q_, 16)

                    float(f(qd)); float(f2(qd))
                    t = paired(lambda: float(f(qd)), lambda: float(f2(qd)), 8)
                except Exception as e:
                    print(f"paged {mode} page={page} rows={rows}: FAIL "
                          f"{repr(e)[:80]}", flush=True)
                    continue
                print(f"paged {mode} page={page} rows={rows}: {t*1e6:.1f} us",
                      flush=True)
                if t < best_t:
                    best, best_t = rows, t
            if best is not None:
                dt = str(pool.k_pages[0].dtype)
                entry[f"paged:{page}x{dt}"] = {"target_rows": best}
                print(f"paged winner page={page} {dt}: rows={best}",
                      flush=True)

    with open(out_path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
