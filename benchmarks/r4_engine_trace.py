"""r4 item 1: attribute the engine-vs-raw served-throughput gap.

Reproduces bench_engine's exact setup (2-layer 8B dims, B=8, burst=64),
then splits the wall time of each burst dispatch into:
  - dispatch: time for the jitted burst call to RETURN (relay ack)
  - toks_readback: np.asarray(toks)  [the data-dependent sync point]
  - len_readback: np.asarray(cache.length)  [metrics]
  - host: scheduler + per-token bookkeeping
and compares against a fully-chained variant (all bursts dispatched
back-to-back, one readback at the end) which bounds pure device time +
one round trip.  Run ON THE TPU (ambient env), nothing else jax-y running.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_tpu.engine.engine import InferenceEngine
from flash_attn_tpu.models import llama

B, S = 8, 8192
cfg = llama.LlamaConfig(
    vocab_size=32768, hidden=4096, intermediate=14336,
    num_layers=2, num_heads=32, num_kv_heads=8,
    head_dim=128, max_position=S, rope_theta=500000.0,
    dtype="bfloat16",
)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
params = llama.quantize_weights(params, mode="int8", skip=("tok_emb",))
eng = InferenceEngine(
    params, llama.make_adapter(cfg, interpret=False),
    max_batch=B, capacity=S, kv_mode="int8",
    cache_dtype=jnp.bfloat16, decode_burst=64,
)
prompt = list(range(1, 65))

# warm: compile prefill + burst graphs
for _ in range(B):
    eng.submit(prompt, max_tokens=65)
t0 = time.perf_counter()
eng.run()
print(f"warm run (compile): {time.perf_counter()-t0:.1f}s", flush=True)

# --- instrumented burst loop (manual replica of the engine's burst path) ---
reqs = [eng.submit(prompt, max_tokens=512) for _ in range(B)]
admitted = eng.sched.admit()
tp0 = time.perf_counter()
for req in admitted:
    eng._do_prefill(req)
t_prefill = time.perf_counter() - tp0
print(f"prefill total: {t_prefill:.3f}s for {len(admitted)} reqs", flush=True)

n_bursts = 8
rows = []
for it in range(n_bursts):
    t0 = time.perf_counter()
    toks_dev, eng.cache = eng._burst_jit(
        eng.params, jnp.asarray(eng.next_token), eng.cache, eng._next_key()
    )
    t1 = time.perf_counter()
    toks = np.asarray(toks_dev)
    t2 = time.perf_counter()
    lens = np.asarray(eng.cache.length)
    t3 = time.perf_counter()
    for slot in range(B):
        for i in range(eng.decode_burst):
            tok = int(toks[i, slot])
            if eng.sched.step_done(slot, tok):
                break
            eng.next_token[slot] = tok
    t4 = time.perf_counter()
    rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3))
    print(
        f"burst {it}: dispatch={t1-t0:.4f}s toks_rb={t2-t1:.4f}s "
        f"len_rb={t3-t2:.4f}s host={t4-t3:.4f}s total={t4-t0:.4f}s",
        flush=True,
    )
r = np.array(rows)
tot = r.sum()
print(
    f"SUM over {n_bursts} bursts: dispatch={r[:,0].sum():.3f} "
    f"toks_rb={r[:,1].sum():.3f} len_rb={r[:,2].sum():.3f} "
    f"host={r[:,3].sum():.3f} total={tot:.3f}s "
    f"-> eng_tps={B*64*n_bursts/tot:.1f}",
    flush=True,
)

# --- chained variant: dispatch all bursts back-to-back, single readback ---
for _ in range(B):
    eng.submit(prompt, max_tokens=65)
eng.run()  # reset slots via normal path
reqs = [eng.submit(prompt, max_tokens=512) for _ in range(B)]
for req in eng.sched.admit():
    eng._do_prefill(req)
t0 = time.perf_counter()
tok_dev = jnp.asarray(eng.next_token)
all_toks = []
for it in range(n_bursts):
    toks_dev, eng.cache = eng._burst_jit(
        eng.params, tok_dev, eng.cache, eng._next_key()
    )
    tok_dev = toks_dev[-1]  # stay on device: carry the last sampled token
    all_toks.append(toks_dev)
t_disp = time.perf_counter() - t0
final = np.asarray(jnp.concatenate(all_toks, axis=0))
t_all = time.perf_counter() - t0
print(
    f"CHAINED: dispatch_all={t_disp:.3f}s wall_with_readback={t_all:.3f}s "
    f"-> eng_tps={B*64*n_bursts/t_all:.1f} shape={final.shape}",
    flush=True,
)
