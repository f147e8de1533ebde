"""r3 item 4 (take 2): FA2 fwd softmax variants with bench.py's honest
paired-chain estimator (the first sweep lacked RTT subtraction)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import chain_step_seconds, roundtrip_seconds
from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd
from flash_attn_tpu.ops.reference import mha_reference

PEAK = 197.0

if __name__ == "__main__":
    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D / 2
    floor = flops / (PEAK * 1e12) / 1.3
    rt = roundtrip_seconds()
    print(f"rt {rt*1e3:.1f} ms", flush=True)

    qs, ks_, vs = q[:, :2048], k[:, :2048], v[:, :2048]
    want = mha_reference(qs, ks_, vs, causal=True)

    cases = [
        (FlashConfig(1024, 1024), "online_f32"),
        (FlashConfig(1024, 1024, exp2=True), "online_f32_exp2"),
        (FlashConfig(1024, 1024, softmax_dtype="bf16", exp2=True),
         "online_bf16_exp2"),
        (FlashConfig(1024, 1024, softmax_mode="clamped"), "clamped_f32"),
        (FlashConfig(1024, 1024, softmax_mode="clamped",
                     softmax_dtype="bf16"), "clamped_bf16"),
        (FlashConfig(1536, 1024, softmax_mode="clamped"), "clamped_1536x1024"),
        (FlashConfig(1024, 2048, softmax_mode="clamped"), "clamped_1024x2048"),
    ]
    for cfg, tag in cases:
        try:
            step = lambda q_, k_, v_: flash_fwd(
                q_, k_, v_, causal=True, config=cfg
            )[0]
            t, info = chain_step_seconds(
                step, q, (k, v), n=4, rt=rt, floor_s=floor
            )
            tf = flops / t / 1e12
            got = flash_fwd(qs, ks_, vs, causal=True, config=cfg)[0]
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32)
            )))
            print(f"{tag}: {t*1e3:.2f} ms  {tf:.1f} TF/s  "
                  f"{tf/PEAK:.4f} of peak  [{info['estimator']}]  "
                  f"maxerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {repr(e)[:90]}", flush=True)
