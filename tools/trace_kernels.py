"""Per-kernel device-time capture (ROADMAP item 12).

Wall-clock through the axon relay carries ~30 ms RTT noise; device traces
don't. This captures a jax.profiler trace around representative kernel
calls (fwd, bwd, decode int8/fp8, paged decode) and prints the trace dir
for Perfetto/TensorBoard.

Run: PALLAS_AXON_POOL_IPS= python tools/run_on_tpu.py tools/trace_kernels.py [outdir]
"""

import sys


def main(outdir="/tmp/fatpu_trace"):
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.flash_bwd import flash_bwd
    from flash_attn_tpu.ops.flash_fwd import flash_fwd
    from flash_attn_tpu.ops.quant import quantize_kv
    from flash_attn_tpu.utils.profiling import trace

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    dout = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)

    fwd = jax.jit(lambda a, b, c: flash_fwd(a, b, c, causal=True))
    out, lse = fwd(q, k, v)
    bwd = jax.jit(
        lambda: flash_bwd(q, k, v, out, lse, dout, causal=True)[0]
    )
    float(jnp.sum(bwd().astype(jnp.float32)))  # warm/compile

    qd = jax.random.normal(key, (8, H, D), jnp.bfloat16)
    kc = jax.random.normal(key, (8, S, Hk, D), jnp.bfloat16)
    vc = jax.random.normal(key, (8, S, Hk, D), jnp.bfloat16)
    dec = {}
    for mode in ("int8", "fp8"):
        kq, ks, vq, vs = quantize_kv(kc, vc, mode)
        args = (
            qd, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
            jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2),
        )
        dec[mode] = jax.jit(
            lambda q_, k_, v_, ks_, vs_: flash_decode(
                q_, k_, v_, k_scale=ks_, v_scale=vs_, kv_layout="bhsd"
            )
        )
        float(jnp.sum(dec[mode](*args).astype(jnp.float32)))
        dec[mode + "_args"] = args

    with trace(outdir):
        float(jnp.sum(fwd(q, k, v)[0].astype(jnp.float32)))
        float(jnp.sum(bwd().astype(jnp.float32)))
        for mode in ("int8", "fp8"):
            float(jnp.sum(
                dec[mode](*dec[mode + "_args"]).astype(jnp.float32)
            ))
    print(f"trace written to {outdir} (open with Perfetto / TensorBoard)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
