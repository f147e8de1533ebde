"""r3: isolate the fp8 composed-step overhead.

Interleaved probe: fp8 2-layer step costs +184 us vs int8 while 1-layer is
FASTER, and the 4-step trace shows equal device-op time — hypothesis: the
block_k=2048 packed-fp8 kernel's VMEM footprint (two half-planes + scales)
blocks overlap with the next layer's weight DMA.  Sweep block_k for the
composed fp8 step.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models import llama
from flash_attn_tpu.ops import decode as dec

B, S = 8, 8192


def build(kv_mode, num_layers, block_k):
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=num_layers, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=S, rope_theta=500000.0, dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    params = llama.quantize_weights(params, mode="int8")
    cache = llama.make_cache(cfg, B, S, mode=kv_mode).advance(S - 512)
    tok0 = jnp.ones((B,), jnp.int32)
    orig = dec._default_block_k
    dec._default_block_k = lambda dt: block_k if dt.itemsize == 1 else orig(dt)

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

    r = (chained(16), chained(32))
    dec._default_block_k = orig
    return r


def t_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    cases = {}
    for bk in (512, 1024, 2048):
        cases[("fp8", bk)] = build("fp8", 2, bk)
    cases[("int8", 2048)] = build("int8", 2, 2048)
    cases[("int8", 1024)] = build("int8", 2, 1024)
    print("built", flush=True)
    samples = {k: ([], []) for k in cases}
    for r in range(7):
        for k, (f16, f32_) in cases.items():
            samples[k][0].append(t_once(f16))
            samples[k][1].append(t_once(f32_))
    for k, (a, b) in samples.items():
        st = (np.median(b) - np.median(a)) / 16
        print(f"{k}: 2-layer step {st*1e6:.1f} us", flush=True)
