"""r3: interleaved re-measurement of int8 vs fp8 composed decode.

Device traces (r3_trace_decode) show fp8 (1280 us/step, 2-layer) <= int8
(1302 us/step) on identical programs, contradicting the sequential probe's
872-vs-554 us/layer wall-clock gap.  This probe builds all four chains
(mode x layers) up front, then times them INTERLEAVED over several rounds
to separate relay/session drift from a true mode difference.

Also measures the effect of an int8-quantized LM head (fusion.97 in the
trace: bf16[4096,32768] head streams 268 MB/step = 357 us at roofline).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models import llama

B, S = 8, 8192


def build(kv_mode, num_layers, quant_head):
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=num_layers, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=S, rope_theta=500000.0, dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    skip = ("tok_emb",) if quant_head else ("tok_emb", "lm_head")
    params = llama.quantize_weights(params, mode="int8", skip=skip)
    cache = llama.make_cache(cfg, B, S, mode=kv_mode).advance(S - 512)
    tok0 = jnp.ones((B,), jnp.int32)

    def chained(m):
        @jax.jit
        def f(params_, tok, cache_):
            def step(carry, _):
                tok_, c = carry
                logits, c = llama.decode_step(params_, tok_, cfg, c)
                return (jnp.argmax(logits, -1).astype(jnp.int32), c), None

            (tok, cache_), _ = jax.lax.scan(step, (tok, cache_), None, length=m)
            return jnp.sum(tok)

        float(f(params, tok0, cache))
        float(f(params, tok0, cache))
        return lambda: float(f(params, tok0, cache))

    return chained(16), chained(32)


def t_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    cases = {}
    for mode in ("int8", "fp8"):
        for L in (1, 2):
            cases[(mode, L)] = build(mode, L, quant_head=False)
    cases[("int8_qh", 2)] = build("int8", 2, quant_head=True)
    print("built all chains", flush=True)

    rounds = 7
    samples = {k: ([], []) for k in cases}
    for r in range(rounds):
        for k, (f16, f32_) in cases.items():
            samples[k][0].append(t_once(f16))
            samples[k][1].append(t_once(f32_))
    step = {}
    for k, (a, b) in samples.items():
        tn, t2n = np.median(a), np.median(b)
        step[k] = (t2n - tn) / 16
        print(f"{k}: step {step[k]*1e6:.1f} us  (n16 {tn*1e3:.2f} ms, "
              f"n32 {t2n*1e3:.2f} ms, spread16 "
              f"{(np.max(a)-np.min(a))*1e3:.2f} ms)", flush=True)
    for mode in ("int8", "fp8"):
        tl = step[(mode, 2)] - step[(mode, 1)]
        t32 = 32 * tl + max(step[(mode, 1)] - tl, 0)
        print(f"{mode}: layer {tl*1e6:.1f} us -> {B/t32:.1f} tok/s/chip",
              flush=True)
    dq = step[("int8", 2)] - step[("int8_qh", 2)]
    print(f"int8 head quantization saves {dq*1e6:.1f} us/step", flush=True)
