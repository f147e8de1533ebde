#!/usr/bin/env python
"""End-to-end draft-model speculative decoding demo on real data.

Trains TWO byte-level Llamas on this repo's own kernel sources (the
bench_ppl_trained recipe): a 4-layer target and a 1-layer draft, then
serves held-out source bytes through the InferenceEngine three ways —
plain greedy, n-gram speculation, draft-model speculation — and reports
tokens, acceptance, and verify-step counts.  Greedy output must be
IDENTICAL across all three (speculation is a pure latency optimization).

Run on the chip:  python tools/run_on_tpu.py tools/demo_draft_spec.py
(or CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/demo_draft_spec.py --interpret --steps 40)
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def train_model(cfg, train_arr, steps, key, interpret):
    from flash_attn_tpu.utils.train import train_tiny_lm

    params, losses = train_tiny_lm(
        cfg, train_arr, steps, key, interpret=interpret
    )
    losses = np.asarray(losses)
    print(f"  trained {cfg.num_layers}-layer: loss "
          f"{losses[:10].mean():.3f} -> {losses[-10:].mean():.3f}",
          flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=96)
    ap.add_argument("--num-draft", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.engine.engine import InferenceEngine, SpecConfig
    from flash_attn_tpu.models import llama

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_files = sorted(glob.glob(
        os.path.join(root, "flash_attn_tpu", "ops", "*.py")
    ))
    train_arr = np.frombuffer(
        b"".join(open(f, "rb").read() for f in train_files), np.uint8
    ).astype(np.int32)
    held = np.frombuffer(
        open(os.path.join(root, "flash_attn_tpu", "engine", "engine.py"),
             "rb").read(), np.uint8
    ).astype(np.int32)

    dtype = "float32" if args.interpret else "bfloat16"
    tcfg = llama.LlamaConfig(
        vocab_size=256, hidden=128, intermediate=512, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=32, max_position=512,
        rope_theta=10000.0, dtype=dtype,
    )
    dcfg = llama.LlamaConfig(
        vocab_size=256, hidden=128, intermediate=512, num_layers=1,
        num_heads=4, num_kv_heads=2, head_dim=32, max_position=512,
        rope_theta=10000.0, dtype=dtype,
    )
    print("training target and draft on repo source bytes...", flush=True)
    tparams = train_model(tcfg, train_arr, args.steps, jax.random.PRNGKey(11),
                          args.interpret)
    dparams = train_model(dcfg, train_arr, args.steps, jax.random.PRNGKey(12),
                          args.interpret)

    prompts = [list(held[i : i + 96]) for i in (0, 4000)]
    tad = llama.make_adapter(tcfg, interpret=args.interpret)
    dad = llama.make_adapter(dcfg, interpret=args.interpret)

    import time

    def serve(spec, tag):
        eng = InferenceEngine(
            tparams, tad, max_batch=2, capacity=512,
            cache_dtype=jnp.dtype(tcfg.dtype), spec=spec,
        )
        reqs = [eng.submit(p, max_tokens=args.max_tokens) for p in prompts]
        t0 = time.perf_counter()
        eng.run()
        wall = time.perf_counter() - t0
        m = eng.metrics
        toks = sum(len(r.generated) for r in reqs)
        line = f"{tag}: {toks} tokens in {wall:.2f}s"
        if m.spec_steps:
            line += (f"; verify steps {m.spec_steps}, emitted "
                     f"{m.spec_emitted} ({m.spec_emitted / m.spec_steps:.2f} "
                     f"tokens/verify, drafts K={spec.num_draft})")
        print(line, flush=True)
        return [list(r.generated) for r in reqs]

    plain = serve(None, "plain greedy")
    ngram = serve(SpecConfig(num_draft=args.num_draft), "n-gram spec")
    draft = serve(
        SpecConfig(num_draft=args.num_draft, draft_params=dparams,
                   draft_adapter=dad),
        "draft-model spec",
    )
    assert ngram == plain, "n-gram spec changed greedy output!"
    assert draft == plain, "draft-model spec changed greedy output!"
    text = bytes(plain[0][:60]).decode("utf-8", errors="replace")
    print("sample continuation:", repr(text))
    print("GREEDY-EXACT OK", flush=True)


if __name__ == "__main__":
    main()
