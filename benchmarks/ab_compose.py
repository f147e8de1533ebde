"""Interleaved A/B harness for COMPOSED decode configs.

Sequential same-session comparisons of composed models drift up to 2x on
the relay chip, and more than ~2 resident 70B-dims slices make the
1-vs-2-layer timings nonsensical (docs/BENCHMARKS.md round-5 methodology
note).  This is the trustworthy form: every config's {1,2}-layer chains
are built up front and timed INTERLEAVED in one measurement loop.

    python tools/run_on_tpu.py benchmarks/ab_compose.py \
        --dims 8b --configs int8:unfused,int8:fused,w4a8:unfused,w4a8:fused
    python tools/run_on_tpu.py benchmarks/ab_compose.py \
        --dims 70b --configs int4:fused,w4a8:fused

Keep the config count low at 70b dims (2 configs = 4 resident slices is
the measured-safe ceiling).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DIMS = {
    "8b": (4096, 14336, 32, 8),
    "70b": (8192, 28672, 64, 8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", choices=DIMS, default="8b")
    ap.add_argument("--configs", default="int8:unfused,w4a8:unfused")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--kv", default="fp8")
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    peaks = CHIP_PEAKS[chip_kind()]
    hidden, inter, nh, nkv = DIMS[args.dims]
    B, S = args.batch, args.seq
    chain_n = 8 if args.dims == "70b" else 16

    cfgs = []
    for spec in args.configs.split(","):
        w_mode, fu = spec.split(":")
        cfgs.append((w_mode, fu == "fused"))

    def build(w_mode, fused, num_layers):
        cfg = llama.LlamaConfig(
            vocab_size=32768, hidden=hidden, intermediate=inter,
            num_layers=num_layers, num_heads=nh, num_kv_heads=nkv,
            head_dim=128, max_position=S, rope_theta=500000.0,
            dtype="bfloat16",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        params = llama.quantize_weights(
            params, mode=w_mode, skip=("tok_emb",), head_mode="w8a8"
        )
        if fused:
            params = llama.fuse_projections(params)
        cache = llama.make_cache(cfg, B, S, mode=args.kv)
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

        return chained(chain_n), chained(2 * chain_n)

    chains = {(w, fu, L): build(w, fu, L) for (w, fu) in cfgs for L in (1, 2)}
    samples = {k: ([], []) for k in chains}
    for _ in range(args.rounds):
        for k, (rn, r2n) in chains.items():
            t0 = time.perf_counter()
            rn()
            samples[k][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r2n()
            samples[k][1].append(time.perf_counter() - t0)

    qkv_n = (nh + 2 * nkv) * 128
    kv_elt = 1 if args.kv in ("fp8", "int8") else 2
    scale = 4 if args.kv in ("fp8", "int8") else 0
    ideal = (
        (hidden * qkv_n + hidden * hidden + 3 * hidden * inter) * 0.5
        + 2 * B * S * nkv * (128 * kv_elt + scale)
    ) / (peaks[2] * 1e9)
    for (w, fu) in cfgs:
        def st(L, w=w, fu=fu):
            a, b = samples[(w, fu, L)]
            return max(
                (float(np.median(b)) - float(np.median(a))) / chain_n, 1e-9
            )

        t1, t2 = st(1), st(2)
        tl = max(t2 - t1, 1e-9)
        print(
            f"{args.dims} {w} {'fused' if fu else 'unfused'}: "
            f"t1 {t1*1e3:.2f} ms  t2 {t2*1e3:.2f} ms  -> layer "
            f"{tl*1e6:.1f} us ({ideal/tl:.4f} of per-layer roofline)",
            flush=True,
        )


if __name__ == "__main__":
    main()
