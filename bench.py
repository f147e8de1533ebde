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
import os
import time

import numpy as np


def _median_time(callable_, iters=7):
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        callable_()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


_MAX_CHAIN = 4096
# Roofline fractions slightly above 1.0 are plausible (bandwidth specs are
# conservative); estimates implying more than this are rejected as jitter.
_MAX_PLAUSIBLE_FRAC = 1.3


def chain_step_seconds(step_fn, init, consts=(), n=32, iters=5, rt=None,
                       floor_s=None):
    """Robust per-step kernel time through the relay.

    Chains m data-dependent steps inside one jit with a scalar readback.
    Because ``block_until_ready`` doesn't synchronize through the axon relay,
    wall time = round-trip + m * t_step; the round-trip (~30 ms) is large and
    jittery, so:

    1. the chain is grown until its incremental time dominates the round-trip
       (m * t >= 4 * rt), sizing m from a pilot measurement;
    2. the estimate is the *median* of paired differences (T(2m)-T(m))/m —
       never a min over a difference estimator, which selects jitter;
    3. estimates below the physical floor for the shape (``floor_s`` =
       ideal_time / 1.3) are rejected; if no paired sample survives, the
       single-chain bound (T(m)-rt)/m (bias: slightly high) is used and
       flagged in the returned info dict.

    Returns (t_seconds, info) where info carries m, the raw samples, and an
    ``estimator`` tag ("paired" | "single_chain").
    """
    import jax
    import jax.numpy as jnp

    if rt is None:
        rt = roundtrip_seconds()

    def chained(m):
        @jax.jit
        def f(x, *cs):
            y = jax.lax.fori_loop(0, m, lambda i, c: step_fn(c, *cs), x)
            return jnp.sum(y.astype(jnp.float32))

        float(f(init, *consts))  # compile + warm
        float(f(init, *consts))
        return lambda: float(f(init, *consts))

    # Pilot: size the chain so m * t_step >= 4 * rt.
    m = n
    run_m = chained(m)
    t_m = _median_time(run_m, iters)
    t_step_pilot = max((t_m - rt) / m, 1e-9)
    target = int(4.0 * rt / t_step_pilot) + 1
    if target > m:
        m = min(1 << (target - 1).bit_length(), _MAX_CHAIN)
        run_m = chained(m)
        t_m = _median_time(run_m, iters)
    run_2m = chained(2 * m)

    lo = floor_s if floor_s is not None else 0.0
    samples = []
    t_m_samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_m()
        t_m_samples.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_2m()
        samples.append(time.perf_counter() - t0)
    paired = [(s2 - np.median(t_m_samples)) / m for s2 in samples]
    accepted = [p for p in paired if p > lo]
    info = {"m": m, "rt_us": round(rt * 1e6, 1)}
    if accepted:
        est = float(np.median(accepted))
        info["estimator"] = "paired"
        info["rejected"] = len(paired) - len(accepted)
        if est > lo:
            return est, info
    # All paired samples physically implausible: fall back to the
    # single-chain upper bound, which cannot go below (T - rt)/m jitter.
    est = max((float(np.median(t_m_samples)) - rt) / m, 1e-9)
    info["estimator"] = "single_chain"
    if floor_s is not None and est <= lo:
        info["error"] = "estimate_below_physical_floor"
    return est, info


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
    flops = 4 * B * H * S * S * D / 2
    floor = flops / (chip_peaks[0] * 1e12) / _MAX_PLAUSIBLE_FRAC
    t, info = chain_step_seconds(step, q, (k, v), n=8, floor_s=floor)
    tflops = flops / t / 1e12
    return {
        "fwd_ms": round(t * 1e3, 3),
        "fwd_tflops": round(tflops, 2),
        "fwd_frac_peak": round(tflops / chip_peaks[0], 4),
        "fwd_estimator": info["estimator"],
    }


def bench_prefill_8b(chip_peaks, softmax_mode="online"):
    """Llama-8B prefill shape: B=1, S=8192, H=32/Hk=8 GQA, causal."""
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    # Headline = the PRODUCTION prefill mode: every model inference
    # prefill path runs clamped softmax (exact for natural-units logits
    # <= 55; see FlashConfig.softmax_mode).  Online — the training /
    # jax.grad mode — is the labeled detail row; its measured ceiling is
    # bounded by probes (stats-free 0.92, best online variant exp2 at
    # 0.630; benchmarks/r3_fwd_softmax_sweep2.py).
    cfg = FlashConfig(block_q=1024, block_k=1024, softmax_mode=softmax_mode)
    tag = "prefill8b" + (
        "" if softmax_mode == "clamped" else f"_{softmax_mode}"
    )
    step = lambda q_, k_, v_: flash_fwd(q_, k_, v_, causal=True, config=cfg)[0]
    flops = 4 * B * H * S * S * D / 2
    floor = flops / (chip_peaks[0] * 1e12) / _MAX_PLAUSIBLE_FRAC
    t, info = chain_step_seconds(step, q, (k, v), n=4, floor_s=floor)
    tflops = flops / t / 1e12
    return {
        f"{tag}_ms": round(t * 1e3, 2),
        f"{tag}_tflops": round(tflops, 1),
        f"{tag}_frac_peak": round(tflops / chip_peaks[0], 4),
        f"{tag}_estimator": info["estimator"],
    }


def bench_decode(chip_peaks, mode="int8", softmax_mode=None):
    """softmax_mode=None measures the production default (clamped for fp8
    KV, online otherwise — ops/decode._default_softmax_mode); explicit
    modes are labeled comparison rows."""
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
            q_, k_, v_, kv_layout="bhsd", softmax_mode=softmax_mode
        ).astype(jnp.bfloat16)
        consts = (kq, vq)
    else:
        step = lambda q_, k_, v_, ks_, vs_: flash_decode(
            q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd",
            softmax_mode=softmax_mode,
        ).astype(jnp.bfloat16)
        consts = (kq, vq, ks, vs)
    tag = f"decode_{mode}" + ("" if softmax_mode is None else f"_{softmax_mode}")
    ideal = kv_bytes / (chip_peaks[2] * 1e9)
    t, info = chain_step_seconds(
        step, q, consts, n=32, floor_s=ideal / _MAX_PLAUSIBLE_FRAC
    )
    out = {
        f"{tag}_us": round(t * 1e6, 1),
        f"{tag}_roofline_frac": round(ideal / t, 4),
        f"{tag}_estimator": info["estimator"],
    }
    if "error" in info:
        out[f"{tag}_error"] = info["error"]
    return out


def bench_flash_bwd(chip_peaks):
    """Pallas backward (dq + dkv passes) at the 8B prefill shape.  Bwd does
    ~2.5x the fwd GEMM work (5 tile GEMMs vs 2)."""
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import flash_fwd

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    dout = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    out, lse = jax.jit(lambda a, b, c: flash_fwd(a, b, c, causal=True))(q, k, v)

    def step(dout_, q_, k_, v_, out_, lse_):
        dq, dk, dv = flash_bwd(q_, k_, v_, out_, lse_, dout_, causal=True)
        return dq

    flops = 2.5 * 4 * B * H * S * S * D / 2
    floor = flops / (chip_peaks[0] * 1e12) / _MAX_PLAUSIBLE_FRAC
    t, info = chain_step_seconds(
        step, dout, (q, k, v, out, lse), n=4, floor_s=floor
    )
    tflops = flops / t / 1e12
    return {
        "bwd_ms": round(t * 1e3, 2),
        "bwd_tflops": round(tflops, 1),
        "bwd_frac_peak": round(tflops / chip_peaks[0], 4),
        "bwd_estimator": info["estimator"],
    }


def bench_paged_decode(chip_peaks, contiguous_us=None, mode="int8"):
    """Scalar-prefetch paged decode at the 8B/8k shape (int8 or packed-fp8
    pages); the target is parity (within ~10%) with the contiguous decode
    kernel."""
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.paged import PagedKVPool, paged_decode_attention
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, Hk, H, D = 8, 8192, 8, 32, 128
    page = 512
    per_seq = S // page
    num_pages = B * per_seq + 1
    pool = PagedKVPool.create(
        1, num_pages, page, B, per_seq, Hk, D, dtype=jnp.bfloat16, mode=mode
    )
    for b in range(B):
        pool = pool.assign_pages(
            b, list(range(1 + b * per_seq, 1 + (b + 1) * per_seq))
        )
    key = jax.random.PRNGKey(4)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kq, ks, vq, vs = quantize_kv(k, v, mode)
    # fill pages directly (layout [P, Hk, page, D])
    kp = jnp.swapaxes(kq, 1, 2).reshape(B, Hk, per_seq, page, D)
    vp = jnp.swapaxes(vq, 1, 2).reshape(B, Hk, per_seq, page, D)
    kp = jnp.moveaxis(kp, 2, 1).reshape(B * per_seq, Hk, page, D)
    vp = jnp.moveaxis(vp, 2, 1).reshape(B * per_seq, Hk, page, D)
    ksl = jnp.swapaxes(ks[..., 0], 1, 2).reshape(B, Hk, per_seq, 1, page)
    vsl = jnp.swapaxes(vs[..., 0], 1, 2).reshape(B, Hk, per_seq, 1, page)
    ksl = jnp.moveaxis(ksl, 2, 1).reshape(B * per_seq, Hk, 1, page)
    vsl = jnp.moveaxis(vsl, 2, 1).reshape(B * per_seq, Hk, 1, page)
    if pool.scales_permuted:
        # fp8 pools store scale lanes in packed (evens-then-odds) page order
        from flash_attn_tpu.ops.decode import _permute_scale_lanes

        ksl = _permute_scale_lanes(ksl, page)
        vsl = _permute_scale_lanes(vsl, page)
    pool = pool._replace(
        k_pages=(pool.k_pages[0].at[1:].set(kp),),
        v_pages=(pool.v_pages[0].at[1:].set(vp),),
        k_scale=(pool.k_scale[0].at[1:].set(ksl),),
        v_scale=(pool.v_scale[0].at[1:].set(vsl),),
        length=jnp.full((B,), S, jnp.int32),
    )
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)

    permuted = pool.scales_permuted

    def step(q_, kpg, vpg, kspg, vspg, tbl, lens):
        from flash_attn_tpu.ops.paged_decode import paged_flash_decode

        return paged_flash_decode(
            q_, kpg, vpg, tbl, lens, k_scale=kspg, v_scale=vspg,
            scales_permuted=permuted,
        ).astype(jnp.bfloat16)

    kv_bytes = (
        2 * B * S * Hk * (D * kq.dtype.itemsize + 4)
    )  # pages + fp32 scale lanes
    ideal = kv_bytes / (chip_peaks[2] * 1e9)
    consts = (
        pool.k_pages[0], pool.v_pages[0], pool.k_scale[0], pool.v_scale[0],
        pool.block_table, pool.length,
    )
    t, info = chain_step_seconds(
        step, q, consts, n=32, floor_s=ideal / _MAX_PLAUSIBLE_FRAC
    )
    tag = "paged_decode" if mode == "int8" else f"paged_decode_{mode}"
    out = {
        f"{tag}_us": round(t * 1e6, 1),
        f"{tag}_roofline_frac": round(ideal / t, 4),
        f"{tag}_estimator": info["estimator"],
    }
    if contiguous_us:
        out[f"{tag}_vs_contiguous"] = round(t * 1e6 / contiguous_us, 3)
    return out


def bench_llama8b_decode(
    chip_peaks,
    modes=(("int8", "int8"), ("int8", "fp8"), ("int4", "fp8"),
           ("w4a8", "fp8")),
):
    """Measured (not extrapolated) Llama-8B decode tokens/s/chip.

    Builds 1- and 2-layer slices with true 8B layer dims (int8 weights
    incl. the LM head, ``kv_modes`` KV, B=8, 8k ctx), times the full jitted
    decode_step (attention + MLP + head + greedy sample) via the
    paired-chain estimator, and composes t(32) = 32 * t_layer + t_nonlayer.
    Slices stay small because the remote-compile helper dies on
    4-layer-sized payloads.  BASELINE headline: tokens/sec/chip; config 1
    names FP8 KV.

    All (mode, layers) chains are built up front and timed INTERLEAVED
    over the measurement rounds: sequential per-mode timing let relay /
    session drift masquerade as a mode difference (round-2's fp8-slower
    artifact; benchmarks/r3_mode_interleave_probe.py).
    """
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama

    B, S = 8, 8192

    def build(wkv, num_layers):
        w_mode, kv_mode = wkv
        cfg = llama.LlamaConfig(
            vocab_size=32768, hidden=4096, intermediate=14336,
            num_layers=num_layers, num_heads=32, num_kv_heads=8,
            head_dim=128, max_position=S, rope_theta=500000.0,
            dtype="bfloat16",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        # quantized head too: the bf16 head streams 268 MB/step (the
        # single biggest non-layer op in the r3 device trace, fusion.97).
        # The head runs w8a8 (native s8xs8, no int8->bf16 cast): the cast
        # pinned the large-N head at 0.55 of the streaming roofline
        # (298 -> 202 us, r4 trace); quality delta measured in the ppl
        # ladder's int8w8a8h row.
        params = llama.quantize_weights(
            params, mode=w_mode, skip=("tok_emb",), head_mode="w8a8"
        )
        # All 8B modes stay UNFUSED: fusing destroys the layer-1 DMA
        # runahead at these dims (int8 0.707 -> 0.558 fused, r4+r5
        # interleaved A/Bs; a dedicated 4-chain A/B showed w4a8 +4%
        # fused, but the full 8-chain bench measured it -10%, so the
        # marginal w4a8 fuse win does not replicate).  70B is different —
        # see bench_llama70b_layer.
        cache = llama.make_cache(cfg, B, S, mode=kv_mode)
        cache = cache.advance(S - 512)  # decode near full context
        tok0 = jnp.ones((B,), jnp.int32)

        def chained(m):
            # params/cache ride as jit ARGUMENTS — closing over them bakes
            # the weights into the HLO as literals (HTTP 413 at 8B dims)
            @jax.jit
            def f(params_, tok, cache_):
                def step(carry, _):
                    tok_, c = carry
                    logits, c = llama.decode_step(params_, tok_, cfg, c)
                    return (
                        jnp.argmax(logits, axis=-1).astype(jnp.int32), c
                    ), None

                (tok, cache_), _ = jax.lax.scan(
                    step, (tok, cache_), None, length=m
                )
                return jnp.sum(tok)

            float(f(params, tok0, cache))
            float(f(params, tok0, cache))
            return lambda: float(f(params, tok0, cache))

        return chained(16), chained(32)

    chains = {
        (wkv, L): build(wkv, L) for wkv in modes for L in (1, 2)
    }
    samples = {k: ([], []) for k in chains}
    for _ in range(7):
        for k, (run_n, run_2n) in chains.items():
            t0 = time.perf_counter()
            run_n()
            samples[k][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_2n()
            samples[k][1].append(time.perf_counter() - t0)

    out = {}
    for wkv in modes:
        w_mode, kv_mode = wkv

        def step_time(L):
            a, b = samples[(wkv, L)]
            return max((float(np.median(b)) - float(np.median(a))) / 16, 1e-9)

        t1 = step_time(1)
        t2 = step_time(2)
        t_layer = max(t2 - t1, 1e-9)
        t_nonlayer = max(t1 - t_layer, 0.0)
        t32 = 32 * t_layer + t_nonlayer
        if wkv == ("int8", "int8"):
            tag = "llama8b"
        elif wkv == ("int8", "fp8"):
            tag = "llama8b_fp8kv"
        else:
            tag = f"llama8b_{w_mode}w_{kv_mode}kv"
        out.update({
            f"{tag}_step_ms_2layer": round(t2 * 1e3, 3),
            f"{tag}_layer_us": round(t_layer * 1e6, 1),
            f"{tag}_step_ms_32layer_est": round(t32 * 1e3, 2),
            f"{tag}_tokens_per_s_chip": round(B / t32, 1),
        })
    return out


def bench_llama70b_layer(chip_peaks, w_modes=("int4", "w4a8")):
    """BASELINE config 4 evidence: measured per-LAYER decode time at true
    Llama-3-70B dims (hidden 8192, 64q/8kv heads, intermediate 28672),
    int4-packed weights + FP8 KV, B=8, 8k ctx — the 1-vs-2-layer
    difference method of bench_llama8b_decode at 70B scale, timed
    INTERLEAVED across weight modes ('int4' = weight-only bf16 decode,
    'w4a8' = same nibbles on the native s8 MXU) so session drift can't
    masquerade as a mode difference.

    The reported tokens/s is the CHIP-EQUIVALENT number
    B / (80 * t_layer + t_nonlayer): per-chip compute throughput if one
    chip did every layer.  A real 70B deployment tensor-shards layers
    (dryrun_multichip validates the sharding); this number is the per-chip
    numerator of that scaling estimate and deliberately excludes TP
    collectives (env: one physical chip).  Vocab is shrunk to 32k so the
    embedding fits; head/embedding time cancels in the layer difference.
    """
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama

    B, S = 8, 8192

    def build(w_mode, num_layers):
        cfg = llama.LlamaConfig(
            vocab_size=32768, hidden=8192, intermediate=28672,
            num_layers=num_layers, num_heads=64, num_kv_heads=8,
            head_dim=128, max_position=S, rope_theta=500000.0,
            dtype="bfloat16",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        params = llama.quantize_weights(
            params, mode=w_mode, skip=("tok_emb",), head_mode="w8a8"
        )
        # At 70B dims FUSED qkv/gate-up wins for both int4 and w4a8 (r5
        # interleaved A/Bs: int4 0.521 -> 0.767, w4a8 0.688 -> 0.936 of
        # the per-layer roofline): fewer, wider kernel calls beat the
        # layer-1 DMA runahead that fusing costs at 8B dims.
        params = llama.fuse_projections(params)
        cache = llama.make_cache(cfg, B, S, mode="fp8")
        cache = cache.advance(S - 512)
        tok0 = jnp.ones((B,), jnp.int32)

        def chained(m):
            @jax.jit
            def f(params_, tok, cache_):
                def step(carry, _):
                    tok_, c = carry
                    logits, c = llama.decode_step(params_, tok_, cfg, c)
                    return (
                        jnp.argmax(logits, axis=-1).astype(jnp.int32), c
                    ), None

                (tok, cache_), _ = jax.lax.scan(
                    step, (tok, cache_), None, length=m
                )
                return jnp.sum(tok)

            float(f(params, tok0, cache))
            float(f(params, tok0, cache))
            return lambda: float(f(params, tok0, cache))

        return chained(8), chained(16)

    # Modes run SEQUENTIALLY (unlike the 8B bench's full interleave): four
    # resident 70B slices (2 modes x {1,2} layers + embeddings + caches)
    # overcommit the chip and the timings go nonsensical (r5: int4
    # t2 < t1, w4a8 3.4x its own component sum).  The critical 1-vs-2
    # layer SUBTRACTION stays interleaved within each mode; only the
    # cross-mode comparison rides on session stability.
    samples = {}
    for w in w_modes:
        chains = {L: build(w, L) for L in (1, 2)}
        samples.update({(w, L): ([], []) for L in chains})
        for _ in range(7):
            for L, (run_n, run_2n) in chains.items():
                t0 = time.perf_counter()
                run_n()
                samples[(w, L)][0].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                run_2n()
                samples[(w, L)][1].append(time.perf_counter() - t0)
        del chains  # free this mode's weights/caches before the next build

    # per-layer roofline: int4 weights + fp8 KV + fp32 scale lanes
    layer_bytes = (
        (8192 * 10240 + 8192 * 8192 + 3 * 8192 * 28672) * 0.5
        + 2 * B * S * 8 * (128 + 4)
    )
    ideal_layer = layer_bytes / (chip_peaks[2] * 1e9)
    out = {}
    for w in w_modes:
        def step_time(L, w=w):
            a, b = samples[(w, L)]
            return max((float(np.median(b)) - float(np.median(a))) / 8, 1e-9)

        t1, t2 = step_time(1), step_time(2)
        t_layer = max(t2 - t1, 1e-9)
        t_nonlayer = max(t1 - t_layer, 0.0)
        t80 = 80 * t_layer + t_nonlayer
        tag = "llama70b" if w == "int4" else f"llama70b_{w}"
        frac = ideal_layer / t_layer
        out.update({
            f"{tag}_int4w_fp8kv_layer_us" if w == "int4"
            else f"{tag}w_fp8kv_layer_us": round(t_layer * 1e6, 1),
            f"{tag}_layer_roofline_frac": round(frac, 4),
            f"{tag}_step_ms_80layer_est": round(t80 * 1e3, 2),
            f"{tag}_tokens_per_s_chip_equiv": round(B / t80, 1),
        })
        if frac > _MAX_PLAUSIBLE_FRAC:
            # the 2L-minus-1L subtraction went below the physical floor —
            # happens under host-side contention (shared-CPU dispatch
            # jitter swamps the paired chains); mark the row so readers
            # don't trust a >roofline "win"
            out[f"{tag}_layer_estimator"] = "implausible_rejected"
    return out


def bench_engine(chip_peaks, raw_tokens_per_s=None, decode_burst=64,
                 w_mode="int8", kv_mode="int8", tag=""):
    """Served (engine-level) throughput on chip — VERDICT r2 item 3: the
    continuous-batching engine driven end-to-end (prefill + decode +
    scheduler + sampler), not just the raw decode_step.

    Llama 8B-dims 2-layer slice, 8 slots, one shared prompt bucket (one
    prefill compile), decode_burst=64 so the ~33 ms relay round-trip
    amortizes over 64 decode steps per dispatch (multi-step scheduling —
    the same knob a production host uses against dispatch latency).
    Reports engine_tokens_per_s and the overhead ratio vs the raw
    decode-step number measured by bench_llama8b_decode on the SAME
    2-layer config.
    """
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.engine import InferenceEngine
    from flash_attn_tpu.models import llama

    B, S = 8, 8192
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=2, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=S, rope_theta=500000.0,
        dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    params = llama.quantize_weights(params, mode=w_mode, skip=("tok_emb",))
    eng = InferenceEngine(
        params, llama.make_adapter(cfg, interpret=False),
        max_batch=B, capacity=S, kv_mode=kv_mode,
        cache_dtype=jnp.bfloat16, decode_burst=decode_burst,
    )
    prompt = list(range(1, 65))  # one 64-token bucket for all slots

    # warm: compile prefill + burst graphs on a short run
    for _ in range(B):
        eng.submit(prompt, max_tokens=65)
    eng.run()

    def run(gen_tokens):
        reqs = [eng.submit(prompt, max_tokens=gen_tokens) for _ in range(B)]
        t0 = time.perf_counter()
        eng.run()
        wall = time.perf_counter() - t0
        return sum(len(r.generated) for r in reqs), wall

    # Two run lengths: the short run carries ~0.5 s of per-batch fixed
    # cost (8 sequential prefill dispatches x relay RTT + first-burst
    # pipeline fill) that a production server pays once per admission,
    # not per token.  The marginal (difference) rate is the steady-state
    # served tokens/sec; both are reported.
    toks1, wall1 = run(512)
    toks2, wall2 = run(2048)
    eng_tps = toks1 / wall1
    steady_tps = (toks2 - toks1) / max(wall2 - wall1, 1e-9)
    out = {
        f"engine{tag}_tokens_per_s_2layer": round(eng_tps, 1),
        f"engine{tag}_steady_tokens_per_s_2layer": round(steady_tps, 1),
        f"engine{tag}_wall_s": round(wall1 + wall2, 3),
        f"engine{tag}_decode_burst": decode_burst,
    }
    if raw_tokens_per_s:
        out[f"engine{tag}_vs_raw_ratio"] = round(
            raw_tokens_per_s / eng_tps, 3
        )
        out[f"engine{tag}_steady_vs_raw_ratio"] = round(
            raw_tokens_per_s / steady_tps, 3
        )
        if steady_tps > raw_tokens_per_s * _MAX_PLAUSIBLE_FRAC:
            # serving cannot beat its own raw decode step; one of the two
            # measurements was contaminated (host contention / session
            # drift between the raw and engine runs)
            out[f"engine{tag}_estimator"] = "implausible_rejected"
    m = eng.metrics.snapshot() if hasattr(eng.metrics, "snapshot") else {}
    if isinstance(m, dict) and "decode_tokens_per_s" in m:
        out[f"engine{tag}_metric_decode_tps"] = round(
            m["decode_tokens_per_s"], 1
        )
    return out


def bench_ppl_delta(chip_peaks, dims=None):
    """Quality-contract numbers at true 8B layer dims (BASELINE.md row 3:
    "perplexity delta bounded at same KV bit-width"; SURVEY.md §4.2).

    Synthetic-but-structured setup: random-init Llama (8B layer dims, 2
    layers — relay payload limit), greedy continuation generated by the
    float model from a fixed prompt, then teacher-forced NLL of that
    continuation re-scored under each (weight, KV) quantization mode via
    prefill_chunk + a scanned decode_step — the exact engine decode path,
    so KV quantize-on-append and fused dequant are in the loop.  Real-
    checkpoint ppl requires weights this zero-egress environment cannot
    fetch; the ladder still bounds the numerical damage of every mode.
    """
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama

    P, T = 128, 32
    CAP = 256  # decode-append capacity (multiple of the append block, 32)
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=2, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=CAP, rope_theta=500000.0,
        dtype="bfloat16",
    )
    if dims:
        cfg = llama.LlamaConfig(**{**cfg.__dict__, **dims})
    base_params = llama.init_params(cfg, jax.random.PRNGKey(7))
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, P)),
        jnp.int32,
    )

    def gen(params, kv_mode):
        cache = llama.make_cache(cfg, 1, CAP, mode=kv_mode)

        @jax.jit
        def f(params_, prompt_, cache_):
            logits, cache_ = llama.prefill_chunk(
                params_, prompt_, cfg, cache_, 0, 0
            )
            cache_ = cache_.set_length(0, P)
            last = jnp.argmax(logits[0, -1]).astype(jnp.int32)

            def step(carry, _):
                tok, c = carry
                lg, c = llama.decode_step(params_, tok[None], cfg, c)
                return (jnp.argmax(lg[0]).astype(jnp.int32), c), tok

            (_, _), toks = jax.lax.scan(step, (last, cache_), None, length=T)
            return toks

        return f(params, prompt, cache)

    cont = gen(base_params, "none")  # float-model greedy continuation [T]

    def nll(params, kv_mode, scored=None):
        scored = cont if scored is None else scored
        cache = llama.make_cache(cfg, 1, CAP, mode=kv_mode)

        @jax.jit
        def f(params_, prompt_, cont_, cache_):
            logits, cache_ = llama.prefill_chunk(
                params_, prompt_, cfg, cache_, 0, 0
            )
            cache_ = cache_.set_length(0, P)

            def step(carry, t):
                lg, c = carry
                logp = jax.nn.log_softmax(lg.astype(jnp.float32))
                lg2, c = llama.decode_step(params_, t[None], cfg, c)
                return (lg2[0], c), -logp[t]

            (_, _), nlls = jax.lax.scan(
                step, (logits[0, -1], cache_), cont_
            )
            return jnp.mean(nlls)

        return float(f(params, prompt, scored, cache))

    out = {}
    base = nll(base_params, "none")
    out["ppl_nll_bf16_none"] = round(base, 5)
    ladder = [("bf16", "int8"), ("bf16", "fp8")]
    wq = {"bf16": base_params}
    for wmode in ("int8", "int4"):
        wq[wmode] = llama.quantize_weights(
            base_params, mode=wmode, skip=("tok_emb",)
        )
        ladder.append((wmode, "none"))
    ladder.append(("int8", "fp8"))
    # BASELINE config 4's exact combo: int4 weights + fp8 KV
    ladder.append(("int4", "fp8"))
    # the serving mode the decode bench runs: int8 layers + w8a8 head
    # (dynamic activation quant on the one large-N matmul)
    wq["int8w8a8h"] = llama.quantize_weights(
        base_params, mode="int8", skip=("tok_emb",), head_mode="w8a8"
    )
    ladder.append(("int8w8a8h", "fp8"))
    # w4a8: same int4 nibbles as the 'int4' rows plus per-token int8
    # activation quant (the s8-MXU serving mode) — its delta vs the int4
    # row isolates the activation-quant cost
    wq["w4a8"] = llama.quantize_weights(
        base_params, mode="w4a8", skip=("tok_emb",), head_mode="w8a8"
    )
    ladder.append(("w4a8", "fp8"))
    for wmode, kv in ladder:
        v = nll(wq[wmode], kv)
        out[f"ppl_nll_{wmode}_{kv}"] = round(v, 5)
        out[f"ppl_delta_{wmode}_{kv}"] = round(v - base, 5)

    # Scoring the float model's OWN greedy continuation at random init is
    # the harness's max-sensitivity point: the scored tokens sit exactly at
    # logit argmaxes of near-uniform noise, so the delta grows ~quadratically
    # with the weight perturbation and overstates int4 damage ~50x
    # (r4 probes: int4 scores random tokens at bench dims within 0.02 nat
    # of float — benchmarks/int4_probe.py).  Report a random-token
    # teacher-forced row alongside for each weight mode so both sensitivity
    # regimes are on record.
    rand_cont = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (T,)),
        jnp.int32,
    )
    base_r = nll(base_params, "none", scored=rand_cont)
    out["ppl_nll_bf16_none_rand"] = round(base_r, 5)
    for wmode in ("int8", "int4", "w4a8"):
        v = nll(wq[wmode], "none", scored=rand_cont)
        out[f"ppl_delta_{wmode}_none_rand"] = round(v - base_r, 5)
    return out


def bench_ppl_trained(chip_peaks, steps=400, windows=4, interpret=False):
    """Quality ladder on a TRAINED model (r3 Weak #2 head-on): train a
    tiny byte-level Llama on this repo's own kernel sources (real,
    structured data present in any environment — no egress needed), then
    teacher-force held-out source bytes under each weight-quantization
    mode through the same prefill+decode path as bench_ppl_delta.

    The random-init 8B-dims ladder scores the float model's own greedy
    continuation at random init — a max-sensitivity probe whose ~1-nat
    int4 delta is a property of the harness, not the scheme
    (benchmarks/int4_probe.py).  These deltas are the meaningful
    ones: quantization damage on a model with real learned structure,
    measured on real held-out data.

    Training runs as ONE jitted lax.scan over the whole step schedule
    (fixed pre-cropped batches ride in as a scan input), so the relay
    pays a single dispatch.
    """
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.train import train_tiny_lm

    root = os.path.dirname(os.path.abspath(__file__))
    train_files = sorted(glob.glob(
        os.path.join(root, "flash_attn_tpu", "ops", "*.py")
    ))
    held_file = os.path.join(root, "flash_attn_tpu", "engine", "engine.py")
    train_bytes = b"".join(open(f, "rb").read() for f in train_files)
    held_bytes = open(held_file, "rb").read()
    train_arr = np.frombuffer(train_bytes, np.uint8).astype(np.int32)
    held_arr = np.frombuffer(held_bytes, np.uint8).astype(np.int32)

    # bf16 params: Mosaic rejects the f32-model training path on chip
    # (f32 x bf16 "Bad rhs type" in the fused attention matmul); adam
    # moments ride in bf16 too — fine at this scale (loss curve checked).
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden=128, intermediate=512, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=32, max_position=256,
        rope_theta=10000.0,
        dtype="float32" if interpret else "bfloat16",
    )
    params, losses = train_tiny_lm(
        cfg, train_arr, steps, jax.random.PRNGKey(11), interpret=interpret
    )
    losses = np.asarray(losses)
    out = {
        "ppl_trained_loss_first": round(float(losses[:10].mean()), 4),
        "ppl_trained_loss_final": round(float(losses[-10:].mean()), 4),
        "ppl_trained_steps": int(steps),
    }

    # held-out teacher-forced NLL through the engine decode path
    P, T = 128, 64
    CAP = 256
    win_starts = np.linspace(
        0, len(held_arr) - (P + T) - 1, windows
    ).astype(np.int64)

    # ONE jitted scorer shared by every (window, quant-mode) pair — the
    # quantized trees differ in structure (retrace per mode) but windows
    # hit the jit cache instead of recompiling the same graph
    @jax.jit
    def score(p_, prompt_, cont_, cache_):
        logits, cache_ = llama.prefill_chunk(
            p_, prompt_, cfg, cache_, 0, 0, interpret=interpret
        )
        cache_ = cache_.set_length(0, P)

        def step(carry, t):
            lg, c = carry
            logp = jax.nn.log_softmax(lg.astype(jnp.float32))
            lg2, c = llama.decode_step(
                p_, t[None], cfg, c, interpret=interpret
            )
            return (lg2[0], c), -logp[t]

        (_, _), nlls = jax.lax.scan(
            step, (logits[0, -1], cache_), cont_
        )
        return jnp.mean(nlls)

    def nll(p, kv_mode):
        total = 0.0
        for w0 in win_starts:
            seq = jnp.asarray(held_arr[w0 : w0 + P + T])
            cache = llama.make_cache(cfg, 1, CAP, mode=kv_mode)
            total += float(score(p, seq[None, :P], seq[P:], cache))
        return total / len(win_starts)

    base = nll(params, "none")
    out["ppl_trained_nll_float"] = round(base, 5)
    for mode in ("int8", "int4", "w4a8"):
        qp = llama.quantize_weights(params, mode=mode)
        v = nll(qp, "none")
        out[f"ppl_trained_nll_{mode}"] = round(v, 5)
        out[f"ppl_trained_delta_{mode}"] = round(v - base, 5)
    # BASELINE config-4 combo on the trained model: int4 weights + fp8 KV
    qp = llama.quantize_weights(params, mode="int4")
    v = nll(qp, "fp8")
    out["ppl_trained_nll_int4_fp8"] = round(v, 5)
    out["ppl_trained_delta_int4_fp8"] = round(v - base, 5)
    return out


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
    try:
        details.update(bench_prefill_8b(peaks, softmax_mode="clamped"))
    except Exception as e:  # pragma: no cover
        details["prefill8b_clamped_error"] = repr(e)[:200]
    try:
        # r4: clamped_verify hybrid — exact-online semantics at
        # clamped-mode speed when scores stay in range (the training-path
        # answer to "online is 0.63 of peak")
        details.update(bench_prefill_8b(peaks, softmax_mode="auto"))
    except Exception as e:  # pragma: no cover
        details["prefill8b_auto_error"] = repr(e)[:200]
    for mode in ("fp8", "int8", "none"):
        try:
            details.update(bench_decode(peaks, mode))
        except Exception as e:  # pragma: no cover
            details[f"decode_{mode}_error"] = repr(e)[:200]
    # non-default softmax modes as labeled comparison rows (the default
    # rows above resolve per KV dtype: fp8 -> clamped, int8 -> online)
    for mode, sm in (("fp8", "online"), ("int8", "clamped")):
        try:
            details.update(bench_decode(peaks, mode, softmax_mode=sm))
        except Exception as e:  # pragma: no cover
            details[f"decode_{mode}_{sm}_error"] = repr(e)[:200]
    try:
        details.update(bench_flash_bwd(peaks))
    except Exception as e:  # pragma: no cover
        details["bwd_error"] = repr(e)[:200]
    try:
        details.update(
            bench_paged_decode(peaks, details.get("decode_int8_us"))
        )
    except Exception as e:  # pragma: no cover
        details["paged_error"] = repr(e)[:200]
    try:
        details.update(
            bench_paged_decode(
                peaks, details.get("decode_fp8_us"), mode="fp8"
            )
        )
    except Exception as e:  # pragma: no cover
        details["paged_fp8_error"] = repr(e)[:200]
    try:
        details.update(bench_llama8b_decode(peaks))
    except Exception as e:  # pragma: no cover
        details["llama8b_error"] = repr(e)[:200]
    try:
        details.update(bench_llama70b_layer(peaks))
    except Exception as e:  # pragma: no cover
        details["llama70b_error"] = repr(e)[:200]
    try:
        details.update(bench_ppl_delta(peaks))
    except Exception as e:  # pragma: no cover
        details["ppl_error"] = repr(e)[:200]
    try:
        details.update(bench_ppl_trained(peaks))
    except Exception as e:  # pragma: no cover
        details["ppl_trained_error"] = repr(e)[:200]
    try:
        # raw 2-layer decode-step throughput for the overhead ratio:
        # tokens/s at the 2-layer step time measured above
        raw2 = None
        if "llama8b_step_ms_2layer" in details:
            raw2 = 8 / (details["llama8b_step_ms_2layer"] / 1e3)
        details.update(bench_engine(peaks, raw_tokens_per_s=raw2))
    except Exception as e:  # pragma: no cover
        details["engine_error"] = repr(e)[:200]
    try:
        # served throughput in the FASTEST serving mode (w4a8 fused
        # weights + fp8 KV), ratio'd against its own matching raw step
        raw48 = None
        if "llama8b_w4a8w_fp8kv_step_ms_2layer" in details:
            raw48 = 8 / (details["llama8b_w4a8w_fp8kv_step_ms_2layer"] / 1e3)
        details.update(bench_engine(
            peaks, raw_tokens_per_s=raw48, w_mode="w4a8", kv_mode="fp8",
            tag="_w4a8",
        ))
    except Exception as e:  # pragma: no cover
        details["engine_w4a8_error"] = repr(e)[:200]

    emit_result(details)


SUMMARY_KEYS = (
    "decode_int8_roofline_frac",
    "bwd_frac_peak",
    "prefill8b_frac_peak",
    "paged_decode_fp8_vs_contiguous",
    "llama8b_int4w_fp8kv_tokens_per_s_chip",
    "llama8b_w4a8w_fp8kv_tokens_per_s_chip",
    "llama70b_w4a8_layer_roofline_frac",
    "ppl_delta_int8_none",
    "engine_steady_vs_raw_ratio",
    "engine_metric_decode_tps",
)


def emit_result(details, out=None, details_path=None):
    """Print the driver-facing result: full details on an earlier line +
    file, then a SHORT final JSON line.

    The final stdout line must stay short: the driver keeps only the tail
    of our output and json-parses the last line — rounds 3/4 inlined the
    full details dict there and the line outgrew the capture window
    (BENCH_r03/r04 record "parsed": null).  Headline = BASELINE config 1:
    Llama-8B-shaped decode with FP8 KV."""
    import sys

    out = out or sys.stdout
    frac = details.get("decode_fp8_roofline_frac", 0.0)
    print(json.dumps({"details": details}), file=out)
    if details_path is None:
        details_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
        )
    try:
        with open(details_path, "w") as f:
            json.dump(details, f, indent=1)
    except OSError:
        pass
    line = json.dumps(
        {
            "metric": "decode_attention_roofline_frac_fp8kv",
            "value": frac,
            "unit": "fraction_of_hbm_roofline",
            "vs_baseline": round(frac / 0.90, 4),  # target: >=90% of roofline
            "details": {
                k: details[k] for k in SUMMARY_KEYS if k in details
            },
        }
    )
    assert len(line) < 1000, "final driver line must stay tail-parseable"
    print(line, file=out)


if __name__ == "__main__":
    main()
