"""Round-2v: adjudicate decode defaults (mode x softmax_mode x block_k)
with bench.py's ROBUST estimator (adaptive chain growth, median of paired
differences, reject-below-physical-floor) — the simple paired estimator
disagreed with itself across sessions (tune_r2s vs r2u) by ±0.3 of
roofline on the same configs.

Run: PALLAS_AXON_POOL_IPS= python tools/run_on_tpu.py benchmarks/tune_r2v.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from bench import _MAX_PLAUSIBLE_FRAC, chain_step_seconds, roundtrip_seconds
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hk, D), jnp.bfloat16)
    rt = roundtrip_seconds()
    print(f"roundtrip {rt*1e6:.0f} us", flush=True)

    for mode in ("fp8", "int8"):
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kv_bytes = 2 * B * S * Hk * (D + 4)
        kt = jnp.swapaxes(kq, 1, 2)
        vt = jnp.swapaxes(vq, 1, 2)
        kst = jnp.swapaxes(ks, 1, 2)
        vst = jnp.swapaxes(vs, 1, 2)
        ideal = kv_bytes / 819e9  # v5e HBM

        for sm in ("online", "clamped"):
            for bk in (1024, 2048):
                step = lambda q_, k_, v_, ks_, vs_, sm=sm, bk=bk: flash_decode(
                    q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd",
                    block_k=bk, softmax_mode=sm,
                ).astype(jnp.bfloat16)
                try:
                    t, info = chain_step_seconds(
                        step, q, (kt, vt, kst, vst), n=32, rt=rt,
                        floor_s=ideal / _MAX_PLAUSIBLE_FRAC,
                    )
                    print(
                        f"decode {mode} {sm} bk={bk}: {t*1e6:.1f} us, "
                        f"{ideal/t:.3f} of roofline "
                        f"[{info['estimator']}, m={info['m']}]",
                        flush=True,
                    )
                except Exception as e:
                    print(f"decode {mode} {sm} bk={bk}: FAIL {repr(e)[:160]}",
                          flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
