"""Llama-3-8B decode-step component benchmark on one chip.

Measures the real per-layer decode costs at 8B shapes (B=8, 8k context):
- flash-decode attention over the int8 BHSD KV cache,
- every projection as weight-only int8 matmul vs plain bf16,
then extrapolates tokens/sec/chip = B / (L * t_layer + t_head) — the
BASELINE.json config-1 headline — without needing 16 GB of weights resident
(each projection is benchmarked standalone; weights stream from HBM either
way, which is exactly the decode regime).

Run: python tools/run_on_tpu.py benchmarks/llama_layer.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def med(f, iters=7):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_step(step, init, consts=(), n=32):
    # consts are jit ARGUMENTS: closed-over arrays become HLO literals and
    # overflow the remote-compile request (HTTP 413).
    def chained(m):
        @jax.jit
        def f(x, *cs):
            return jnp.sum(
                jax.lax.fori_loop(
                    0, m, lambda i, c: step(c, *cs), x
                ).astype(jnp.float32)
            )

        float(f(init, *consts))
        float(f(init, *consts))
        return lambda: float(f(init, *consts))

    a = med(chained(n))
    b = med(chained(2 * n))
    return max((b - a) / n, 1e-9)


def bench_matmul(M, K, N, kind, key):
    from flash_attn_tpu.ops.matmul import matmul_int8
    from flash_attn_tpu.ops.quant import quantize_int8

    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N), jnp.bfloat16)
    if kind == "int8":
        vals, scale = quantize_int8(w, axes=(0,))
        scales = scale[0]
        # chain via a cheap feedback projection so shapes line up
        back = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01
        step = lambda x_, v_, s_, b_: (
            matmul_int8(x_, v_, s_, out_dtype=jnp.bfloat16) @ b_
        )
        t = chain_step(step, x, (vals, scales, back), n=16)
    else:
        back = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01
        step = lambda x_, w_, b_: (
            jnp.dot(x_, w_, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            @ b_
        )
        t = chain_step(step, x, (w, back), n=16)
    # subtract the feedback matmul estimate? it's N*K*M flops vs K*N*M — same
    # order; report the pair time and the bytes-based roofline for w only.
    return t


def main():
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.quant import quantize_kv

    key = jax.random.PRNGKey(0)
    B, S, H, Hk, D = 8, 8192, 32, 8, 128
    hidden, inter = 4096, 14336
    L = 32

    # attention over int8 KV (BHSD production layout)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kc = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    vc = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    kq, ks, vq, vs = quantize_kv(kc, vc, "int8")
    kq, vq = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    ks, vs = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)
    t_attn = chain_step(
        lambda q_, a, b, c, d: flash_decode(
            q_, a, b, k_scale=c, v_scale=d, kv_layout="bhsd"
        ).astype(jnp.bfloat16),
        q,
        (kq, vq, ks, vs),
        n=32,
    )
    print(f"attn decode int8-KV: {t_attn*1e6:.1f} us", flush=True)

    # projections (paired-matmul chains; reported time includes the feedback
    # matmul, so per-projection cost is roughly half the pair for same-size
    # pairs — we report the raw pair time and use it as an upper bound)
    shapes = {
        "qkv+o (4096->6144 + back)": (B, hidden, H * D + 2 * Hk * D),
        "mlp up+gate (4096->28672 pair)": (B, hidden, 2 * inter),
        "mlp down (14336->4096 + back)": (B, inter, hidden),
    }
    t_proj_int8 = {}
    t_proj_bf16 = {}
    for name, (M, K, N) in shapes.items():
        t8 = bench_matmul(M, K, N, "int8", key)
        tb = bench_matmul(M, K, N, "bf16", key)
        t_proj_int8[name] = t8
        t_proj_bf16[name] = tb
        w_bytes8 = K * N * 1 + N * 4
        w_bytes16 = K * N * 2
        print(
            f"{name}: int8 {t8*1e6:.1f} us (w-roofline {w_bytes8/819e9/t8:.2f}), "
            f"bf16 {tb*1e6:.1f} us (w-roofline {w_bytes16/819e9/tb:.2f})",
            flush=True,
        )

    # layer estimate: attention + qkv/o pair + mlp pairs (pair times already
    # include a comparable-size feedback matmul ≈ the o/down projection)
    t_layer8 = t_attn + t_proj_int8["qkv+o (4096->6144 + back)"] + \
        t_proj_int8["mlp up+gate (4096->28672 pair)"] / 2 + \
        t_proj_int8["mlp down (14336->4096 + back)"] / 2
    t_layer16 = t_attn + t_proj_bf16["qkv+o (4096->6144 + back)"] + \
        t_proj_bf16["mlp up+gate (4096->28672 pair)"] / 2 + \
        t_proj_bf16["mlp down (14336->4096 + back)"] / 2
    for name, tl in [("int8 weights", t_layer8), ("bf16 weights", t_layer16)]:
        step = L * tl
        tps = B / step
        print(
            f"8B decode estimate ({name}): {tl*1e6:.0f} us/layer, "
            f"{step*1e3:.2f} ms/step, {tps:.0f} tokens/s/chip (B={B})",
            flush=True,
        )
    print("LLAMA LAYER BENCH DONE")


if __name__ == "__main__":
    main()
