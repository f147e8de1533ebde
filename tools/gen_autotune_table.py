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

    with open(out_path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
