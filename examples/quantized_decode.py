"""Quantized-KV decode walkthrough: quantize a cache, run the fused-dequant
flash-decode kernel, compare against the float oracle.

    python examples/quantized_decode.py --mode fp8
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int8", choices=["int8", "fp8"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seqlen", type=int, default=2048)
    args = ap.parse_args()

    from flash_attn_tpu import flash_decode, quantize_kv

    B, S, H, Hk, D = args.batch, args.seqlen, 16, 4, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hk, D), jnp.bfloat16)

    kq, ks, vq, vs = quantize_kv(k, v, args.mode)
    # decode-optimal heads-major layout
    out = flash_decode(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
        k_scale=jnp.swapaxes(ks, 1, 2), v_scale=jnp.swapaxes(vs, 1, 2),
        kv_layout="bhsd",
    )
    ref = flash_decode(q, k, v, use_kernel=False)
    err = float(jnp.mean(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"{args.mode}-KV fused-dequant decode: out {out.shape}, "
          f"mean |err| vs float cache = {err:.4f}")


if __name__ == "__main__":
    main()
