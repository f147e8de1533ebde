"""Parameterized on-chip block-config sweep runner.

Replaces the round-2/3 one-off tune_* scripts (their findings live in
docs/BENCHMARKS.md "negative results" and the shipped autotune table).
Each mode sweeps one kernel's tiling knobs at a given shape and prints a
ranked table; timing uses bench.py's paired-chain estimator (the only
reliable clock through the axon relay).

Run ON the TPU box (ambient env), nothing else jax-y running:

    python benchmarks/sweep.py fwd    --seq 8192 --heads 32 --kv-heads 8
    python benchmarks/sweep.py decode --seq 8192 --batch 8 --kv fp8
    python benchmarks/sweep.py paged  --page 512 --kv fp8
    python benchmarks/sweep.py matmul --m 8 --k 4096 --n 14336 --w int8

Results worth keeping go into utils/autotune_table.json via
tools/gen_autotune_table.py.
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _peaks():
    from flash_attn_tpu.utils.profiling import CHIP_PEAKS, chip_kind

    return CHIP_PEAKS[chip_kind()]


def sweep_fwd(args):
    import jax
    import jax.numpy as jnp

    from bench import chain_step_seconds
    from flash_attn_tpu.ops.flash_fwd import FlashConfig, flash_fwd

    B, S, H, Hk, D = 1, args.seq, args.heads, args.kv_heads, args.head_dim
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 2 * 2 * B * H * S * S * D * (0.5 if args.causal else 1.0)
    rows = []
    for bq, bk, mode in itertools.product(
        (128, 256, 512), (128, 256, 512), ("online", args.softmax_mode)
    ):
        cfg = FlashConfig(block_q=bq, block_k=bk, softmax_mode=mode)
        try:
            step = lambda q_, k_, v_: flash_fwd(  # noqa: E731
                q_, k_, v_, causal=args.causal, config=cfg
            )[0].astype(jnp.bfloat16)
            t, info = chain_step_seconds(step, q, (k, v), n=8)
            rows.append((flops / t / 1e12, bq, bk, mode, info["estimator"]))
            print(f"bq={bq} bk={bk} {mode}: {rows[-1][0]:.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk} {mode}: FAILED {str(e)[:80]}", flush=True)
    for r in sorted(rows, reverse=True)[:5]:
        print("TOP", r)


def sweep_decode(args):
    import jax
    import jax.numpy as jnp

    from bench import chain_step_seconds
    from flash_attn_tpu.ops.decode import DecodeConfig, flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    B, S, Hk, H, D = args.batch, args.seq, args.kv_heads, args.heads, args.head_dim
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kq, ks, vq, vs = quantize_kv(k, v, args.kv)
    kv_bytes = 2 * B * S * Hk * (kq.dtype.itemsize * D + (4 if args.kv != "none" else 0))
    ideal = kv_bytes / (_peaks()[2] * 1e9)
    for bk, splits in itertools.product((256, 512, 1024), (1, 2, 4, 8)):
        cfg = DecodeConfig(block_k=bk, num_splits=splits)
        try:
            step = lambda q_, *cs: flash_decode(  # noqa: E731
                q_, *cs[:2], k_scale=cs[2], v_scale=cs[3], config=cfg
            ).astype(jnp.bfloat16)
            t, info = chain_step_seconds(step, q, (kq, vq, ks, vs), n=16)
            print(
                f"bk={bk} splits={splits}: {t*1e6:.1f} us "
                f"({ideal/t:.3f} roofline, {info['estimator']})", flush=True
            )
        except Exception as e:  # noqa: BLE001
            print(f"bk={bk} splits={splits}: FAILED {str(e)[:80]}", flush=True)


def sweep_paged(args):
    from bench import bench_paged_decode

    print(bench_paged_decode(_peaks(), mode=args.kv))


def sweep_matmul(args):
    import jax
    import jax.numpy as jnp

    from bench import chain_step_seconds
    from flash_attn_tpu.models import llama  # noqa: F401 (env warm)
    from flash_attn_tpu.ops.matmul import (
        W4A8Weight, matmul_int4, matmul_int8, matmul_w4a8, matmul_w8a8
    )
    from flash_attn_tpu.ops.quant import quantize_int4, quantize_int8

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (args.m, args.k), jnp.bfloat16)
    w = jax.random.normal(key, (args.k, args.n), jnp.float32) * 0.02
    w_bytes = args.k * args.n * (0.5 if args.w in ("int4", "w4a8") else 1)
    ideal = w_bytes / (_peaks()[2] * 1e9)
    if args.w == "int4":
        qw = quantize_int4(w, group_size=args.group)
        mm = lambda x_, bn, bk: matmul_int4(  # noqa: E731
            x_, qw, block_n=bn, block_k=bk
        )
    elif args.w == "w4a8":
        q4 = quantize_int4(w, group_size=args.group, layout="halves")
        qw = W4A8Weight(q4.packed, q4.scales, q4.group_size, q4.shape)
        mm = lambda x_, bn, bk: matmul_w4a8(  # noqa: E731
            x_, qw, block_n=bn, block_k=bk
        )
    elif args.w == "w8a8":
        vals, sc = quantize_int8(w, axes=(0,))
        mm = lambda x_, bn, bk: matmul_w8a8(  # noqa: E731
            x_, vals, sc[0], block_n=bn, block_k=bk
        )
    else:
        vals, sc = quantize_int8(w, axes=(0,))
        mm = lambda x_, bn, bk: matmul_int8(  # noqa: E731
            x_, vals, sc[0], block_n=bn, block_k=bk
        )

    bns = [int(b) for b in args.block_n.split(",")]
    bks = [int(b) for b in args.block_k.split(",")]
    rows = []
    for bn, bk in itertools.product(bns, bks):
        if args.w in ("int4", "w4a8") and bk % args.group:
            continue
        try:
            # output shape [m, n] != input [m, k]: close the chain with a
            # tiny data dependence (x + eps*sum(y)) so fori_loop carries a
            # fixed shape and XLA can't hoist the matmul out of the loop
            def step(x_, bn=bn, bk=bk):
                y = mm(x_, bn, bk)
                return x_ + (jnp.sum(y.astype(jnp.float32)) * 1e-20).astype(
                    x_.dtype
                )

            t, info = chain_step_seconds(
                step, x, (), n=32, floor_s=ideal / 1.3
            )
            rows.append((t, bn, bk, info["estimator"]))
            print(
                f"bn={bn} bk={bk}: {t*1e6:.1f} us "
                f"({ideal/t:.3f} of weight-stream roofline, "
                f"{info['estimator']})", flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bn={bn} bk={bk}: FAILED {str(e)[:100]}", flush=True)
    rows.sort()
    if rows:
        t, bn, bk, est = rows[0]
        print(
            f"BEST {args.w} [{args.m}x{args.k}x{args.n}]: bn={bn} bk={bk} "
            f"{t*1e6:.1f} us ({ideal/t:.3f} roofline, {est})"
        )


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    f = sub.add_parser("fwd")
    f.add_argument("--seq", type=int, default=8192)
    f.add_argument("--heads", type=int, default=32)
    f.add_argument("--kv-heads", type=int, default=8)
    f.add_argument("--head-dim", type=int, default=128)
    f.add_argument("--causal", action="store_true")
    f.add_argument("--softmax-mode", default="clamped")
    d = sub.add_parser("decode")
    d.add_argument("--seq", type=int, default=8192)
    d.add_argument("--batch", type=int, default=8)
    d.add_argument("--heads", type=int, default=32)
    d.add_argument("--kv-heads", type=int, default=8)
    d.add_argument("--head-dim", type=int, default=128)
    d.add_argument("--kv", default="fp8")
    p = sub.add_parser("paged")
    p.add_argument("--page", type=int, default=512)
    p.add_argument("--kv", default="fp8")
    m = sub.add_parser("matmul")
    m.add_argument("--m", type=int, default=8)
    m.add_argument("--k", type=int, default=4096)
    m.add_argument("--n", type=int, default=14336)
    m.add_argument("--w", default="int8")
    m.add_argument("--group", type=int, default=128)
    m.add_argument("--block-n", default="512,1024,2048")
    m.add_argument("--block-k", default="512,1024,2048,4096")
    args = ap.parse_args()
    {
        "fwd": sweep_fwd, "decode": sweep_decode,
        "paged": sweep_paged, "matmul": sweep_matmul,
    }[args.mode](args)


if __name__ == "__main__":
    main()
