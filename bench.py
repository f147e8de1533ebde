"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): decode-attention % of HBM roofline with
quantized KV on one chip.  Decode attention is bandwidth-bound: ideal time =
KV bytes / HBM bandwidth; we report achieved/ideal.  Also measures the FA2
forward kernel's TFLOP/s as a secondary detail.

Run on the real TPU by the driver; falls back to CPU numbers (marked) if no
TPU is present.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Per-chip peak numbers for roofline accounting.
CHIP_SPECS = {
    # name: (bf16 TFLOP/s, HBM GB/s)
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "cpu": (1.0, 50.0),
}


def chip_kind():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for name in CHIP_SPECS:
        if name in kind:
            return name
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    return "cpu" if d.platform == "cpu" else "v5e"


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_flash_fwd(chip):
    from flash_attn_tpu.ops.flash_fwd import flash_fwd

    B, S, H, D = 4, 2048, 16, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    fn = jax.jit(lambda a, b, c: flash_fwd(a, b, c, causal=True)[0])
    t = timeit(fn, q, k, v)
    flops = 4 * B * H * S * S * D / 2  # causal
    tflops = flops / t / 1e12
    peak = CHIP_SPECS[chip][0]
    return {"fwd_tflops": round(tflops, 2), "fwd_frac_peak": round(tflops / peak, 4),
            "fwd_ms": round(t * 1e3, 3)}


def bench_decode(chip, mode="int8"):
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    if mode == "none":
        kq, ks, vq, vs = k, None, v, None
        kv_bytes = 2 * B * S * Hk * D * 2
    else:
        kq, ks, vq, vs = quantize_kv(k, v, mode)
        kv_bytes = 2 * B * S * Hk * D * 1 + 2 * B * S * Hk * 4

    fn = jax.jit(
        lambda q_, k_, v_, ks_, vs_: flash_decode(
            q_, k_, v_, k_scale=ks_, v_scale=vs_
        )
    )
    t = timeit(fn, q, kq, vq, ks, vs)
    bw = CHIP_SPECS[chip][1] * 1e9
    ideal = kv_bytes / bw
    return {
        f"decode_{mode}_us": round(t * 1e6, 1),
        f"decode_{mode}_roofline_frac": round(ideal / t, 4),
    }


def main():
    chip = chip_kind()
    details = {"chip": chip, "backend": jax.default_backend()}
    try:
        details.update(bench_flash_fwd(chip))
    except Exception as e:  # pragma: no cover
        details["fwd_error"] = repr(e)[:200]
    for mode in ("int8", "none"):
        try:
            details.update(bench_decode(chip, mode))
        except Exception as e:  # pragma: no cover
            details[f"decode_{mode}_error"] = repr(e)[:200]

    frac = details.get("decode_int8_roofline_frac", 0.0)
    print(
        json.dumps(
            {
                "metric": "decode_attention_roofline_frac_int8kv",
                "value": frac,
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(frac / 0.90, 4),  # target: >=90% of roofline
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
