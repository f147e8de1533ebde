"""Attribute the composed decode-step gap: per-kernel device trace.

BENCH_r03: llama8b int8w+fp8kv layer = 619 us but the streaming floor is
~420 us (218 MB int8 weights + 126 MB fp8 KV at 819 GB/s).  int4w+fp8kv
layer = 574 us vs a ~290 us floor.  This captures a device trace of the
jitted 2-layer decode step (the exact bench_llama8b_decode program) and
aggregates device op time by source line, so the ~200 us/layer overhead
gets names.

Run: python tools/run_on_tpu.py benchmarks/r4_decode_trace.py [w_mode kv_mode]
"""

import sys

sys.path.insert(0, "/root/repo")


def main(w_mode="int8", kv_mode="fp8"):
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.profiling import trace

    B, S = 8, 8192
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=2, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=S, rope_theta=500000.0,
        dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if "+" in w_mode:  # e.g. "int8+w8a8" = int8 layers, w8a8 head
        lmode, hmode = w_mode.split("+")
        params = llama.quantize_weights(
            params, mode=lmode, skip=("tok_emb",), head_mode=hmode
        )
    else:
        params = llama.quantize_weights(
            params, mode=w_mode, skip=("tok_emb",)
        )
    params_f = llama.fuse_projections(params)
    cache = llama.make_cache(cfg, B, S, mode=kv_mode)
    cache = cache.advance(S - 512)
    tok0 = jnp.ones((B,), jnp.int32)

    @jax.jit
    def f(params_, tok, cache_):
        def step(carry, _):
            tok_, c = carry
            logits, c = llama.decode_step(params_, tok_, cfg, c)
            return (jnp.argmax(logits, axis=-1).astype(jnp.int32), c), None

        (tok, cache_), _ = jax.lax.scan(step, (tok, cache_), None, length=16)
        return jnp.sum(tok)

    sys.path.insert(0, "/root/repo/tools")
    from trace_by_source import aggregate

    # trace unfused and fused back-to-back in ONE session so relay/session
    # drift can't masquerade as a difference
    for tag, p in (("unfused", params), ("fused", params_f),
                   ("unfused2", params), ("fused2", params_f)):
        float(f(p, tok0, cache))
        float(f(p, tok0, cache))
        outdir = f"/tmp/fatpu_decode_trace_{w_mode}_{kv_mode}_{tag}"
        with trace(outdir):
            float(f(p, tok0, cache))
        print(f"=== {tag} ===", flush=True)
        aggregate(outdir, nstep=16, top=12)


if __name__ == "__main__":
    main(*sys.argv[1:])
