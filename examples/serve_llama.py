"""Serve a (quantized) Llama over HTTP with continuous batching.

Usage (real checkpoint):
    python examples/serve_llama.py --model meta-llama/Meta-Llama-3-8B \
        --kv-mode fp8 --weights int8 --port 8477
Usage (random-init smoke test, no network):
    python examples/serve_llama.py --tiny
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--kv-mode", default="none", choices=["none", "int8", "fp8"])
    ap.add_argument("--weights", default="none",
                    choices=["none", "int8", "int4", "w8a8", "w4a8"])
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--port", type=int, default=8477)
    args = ap.parse_args()

    from flash_attn_tpu.engine.engine import InferenceEngine
    from flash_attn_tpu.models import llama
    from flash_attn_tpu.serving import ServingConfig, serve

    if args.tiny:
        cfg = llama.LLAMA_TINY
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    else:
        params, cfg = llama.load_hf(args.model)
    if args.weights != "none":
        params = llama.quantize_weights(params, mode=args.weights)

    eng = InferenceEngine(
        params, llama.make_adapter(cfg),
        max_batch=args.max_batch, capacity=args.capacity,
        kv_mode=args.kv_mode, cache_dtype=jnp.dtype(cfg.dtype),
    )
    print(f"serving on :{args.port}  (POST /generate "
          '{"prompt": [1,2,3], "max_tokens": 32})', flush=True)
    serve(eng, ServingConfig(port=args.port))


if __name__ == "__main__":
    main()
