"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): decode-attention % of HBM roofline with
quantized KV on one chip.  Decode attention is bandwidth-bound: ideal time =
KV bytes / HBM bandwidth; we report achieved/ideal.  Also measures the FA2
forward kernel's TFLOP/s as a secondary detail.

Timing methodology: through the axon relay, ``block_until_ready`` does NOT
synchronize with remote execution (dispatch acks immediately), so every
measurement chains N data-dependent kernel invocations inside one jit and
forces a scalar host readback; kernel time = (t_chain - t_roundtrip) / N.
"""

import json
import time

import numpy as np


def _median_time(callable_, iters=7):
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        callable_()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def chain_step_seconds(step_fn, init, consts=(), n=32, iters=7):
    """Per-step kernel time via paired chains: t = (T(2n) - T(n)) / n.

    Chains n (and 2n) data-dependent steps inside one jit with a scalar
    readback; the subtraction cancels the (large, jittery) relay round-trip
    so the estimate is offset-free.  Large arrays the step uses must be in
    ``consts`` (jit ARGUMENTS) — closed-over arrays are baked into the HLO
    as literals and blow up the remote-compile payload.
    """
    import jax
    import jax.numpy as jnp

    def chained(m):
        @jax.jit
        def f(x, *cs):
            y = jax.lax.fori_loop(0, m, lambda i, c: step_fn(c, *cs), x)
            return jnp.sum(y.astype(jnp.float32))

        float(f(init, *consts))  # compile + warm
        float(f(init, *consts))
        return lambda: float(f(init, *consts))

    run_n = chained(n)
    run_2n = chained(2 * n)
    t_n = _median_time(run_n, iters)
    t_2n = _median_time(run_2n, iters)
    return max((t_2n - t_n) / n, 1e-9)


def roundtrip_seconds():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))
    return _median_time(lambda: float(f(x)))


def bench_flash_fwd(chip_peaks):
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import flash_fwd

    B, S, H, D = 4, 2048, 16, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)

    step = lambda q_, k_, v_: flash_fwd(q_, k_, v_, causal=True)[0]
    t = min(chain_step_seconds(step, q, (k, v), n=8) for _ in range(2))
    flops = 4 * B * H * S * S * D / 2
    tflops = flops / t / 1e12
    return {
        "fwd_ms": round(t * 1e3, 3),
        "fwd_tflops": round(tflops, 2),
        "fwd_frac_peak": round(tflops / chip_peaks[0], 4),
    }


def bench_prefill_8b(chip_peaks):
    """Llama-8B prefill shape: B=1, S=8192, H=32/Hk=8 GQA, causal."""
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    cfg = FlashConfig(block_q=512, block_k=2048)
    step = lambda q_, k_, v_: flash_fwd(q_, k_, v_, causal=True, config=cfg)[0]
    t = min(chain_step_seconds(step, q, (k, v), n=4) for _ in range(2))
    flops = 4 * B * H * S * S * D / 2
    tflops = flops / t / 1e12
    return {
        "prefill8b_ms": round(t * 1e3, 2),
        "prefill8b_tflops": round(tflops, 1),
        "prefill8b_frac_peak": round(tflops / chip_peaks[0], 4),
    }


def bench_decode(chip_peaks, mode="int8"):
    import jax
    import jax.numpy as jnp

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
        elem = 1  # int8 / fp8
        kv_bytes = 2 * B * S * Hk * (D * elem + 4)

    # production layout: heads-major cache + lane-dense scales (see
    # ops/decode.py BHSD kernel)
    kq = jnp.swapaxes(kq, 1, 2)
    vq = jnp.swapaxes(vq, 1, 2)
    ks = None if ks is None else jnp.swapaxes(ks, 1, 2)
    vs = None if vs is None else jnp.swapaxes(vs, 1, 2)
    if ks is None:
        step = lambda q_, k_, v_: flash_decode(
            q_, k_, v_, kv_layout="bhsd"
        ).astype(jnp.bfloat16)
        consts = (kq, vq)
    else:
        step = lambda q_, k_, v_, ks_, vs_: flash_decode(
            q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd"
        ).astype(jnp.bfloat16)
        consts = (kq, vq, ks, vs)
    # relay jitter makes single estimates vary +-20%; take the best of 3
    # (compile caches after the first, so repeats are cheap)
    t = min(chain_step_seconds(step, q, consts, n=32) for _ in range(3))
    ideal = kv_bytes / (chip_peaks[2] * 1e9)
    return {
        f"decode_{mode}_us": round(t * 1e6, 1),
        f"decode_{mode}_roofline_frac": round(ideal / t, 4),
    }


def main():
    import os
    import subprocess
    import sys

    if os.environ.get("FATPU_BENCH_ORCH") == "1":
        # Clean orchestrator (no axon client in this process): spawn fresh
        # children that re-attempt TPU registration at startup.
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = env.pop("FATPU_POOL_IPS_SAVED")
        env.pop("FATPU_BENCH_ORCH")
        env["FATPU_BENCH_CHILD"] = "1"
        # Escalating backoff: a relay wedged by a killed mid-compile process
        # can take ~10 min to recover.
        for attempt in range(10):
            r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
            if r.returncode == 0:
                sys.exit(0)
            time.sleep(min(30 * (attempt + 1), 150))
        # TPU never came up: emit a stub line rather than burning hours on
        # CPU interpret-mode kernels.
        print(
            json.dumps(
                {
                    "metric": "decode_attention_roofline_frac_int8kv",
                    "value": 0.0,
                    "unit": "fraction_of_hbm_roofline",
                    "vs_baseline": 0.0,
                    "details": {"error": "tpu_unavailable_after_retries"},
                }
            )
        )
        return

    from flash_attn_tpu.utils.tpu_connect import tpu_available

    if not tpu_available() and os.environ.get("PALLAS_AXON_POOL_IPS"):
        # Startup TPU registration failed; this process's axon client is
        # broken and (observed) can wedge the relay for successors — replace
        # ourselves with a clean orchestrator that never touches axon.
        if os.environ.get("FATPU_BENCH_CHILD"):
            sys.exit(42)
        env = dict(os.environ)
        env["FATPU_BENCH_ORCH"] = "1"
        env["FATPU_POOL_IPS_SAVED"] = env.pop("PALLAS_AXON_POOL_IPS")
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
    _run_bench()


def _run_bench():

    import jax

    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    chip = chip_kind()
    peaks = CHIP_PEAKS[chip]
    rt = roundtrip_seconds()
    details = {
        "chip": chip,
        "backend": jax.default_backend(),
        "roundtrip_us": round(rt * 1e6, 1),
    }
    try:
        details.update(bench_flash_fwd(peaks))
    except Exception as e:  # pragma: no cover
        details["fwd_error"] = repr(e)[:200]
    try:
        details.update(bench_prefill_8b(peaks))
    except Exception as e:  # pragma: no cover
        details["prefill8b_error"] = repr(e)[:200]
    for mode in ("int8", "none"):
        try:
            details.update(bench_decode(peaks, mode))
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
