"""Round-3 item 1: per-kernel attribution of the composed Llama-8B decode
step (VERDICT_r02 'what's weak' #1 — 2755 us/layer measured vs ~0.9 ms of
accounted components).

Traces a 2-layer 8B-dims decode_step chain (the exact bench_llama8b_decode
configuration) with jax.profiler, then parses the Perfetto trace.json.gz and
prints per-op total device time, sorted.  Device-side timestamps don't carry
the ~30 ms axon relay RTT.

Run: python benchmarks/r3_trace_decode.py [kv_mode] [outdir]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def run_trace(kv_mode="int8", outdir="/tmp/fatpu_r3_decode_trace"):
    from flash_attn_tpu.utils.tpu_connect import ensure_tpu

    ensure_tpu()
    import jax
    import jax.numpy as jnp

    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.profiling import trace

    B, S = 8, 8192
    NSTEP = 4
    cfg = llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=2, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=S, rope_theta=500000.0,
        dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    params = llama.quantize_weights(params, mode="int8")
    cache = llama.make_cache(cfg, B, S, mode=kv_mode)
    cache = cache.advance(S - 512)
    tok0 = jnp.ones((B,), jnp.int32)

    @jax.jit
    def f(params_, tok, cache_):
        def step(carry, _):
            tok_, c = carry
            logits, c = llama.decode_step(params_, tok_, cfg, c)
            return (jnp.argmax(logits, axis=-1).astype(jnp.int32), c), None

        (tok, cache_), _ = jax.lax.scan(step, (tok, cache_), None, length=NSTEP)
        return jnp.sum(tok)

    float(f(params, tok0, cache))  # compile
    float(f(params, tok0, cache))  # warm
    with trace(outdir):
        float(f(params, tok0, cache))
    return outdir, NSTEP


def parse_trace(outdir, nstep):
    paths = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("NO TRACE FILES under", outdir)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # Device-side complete events: pid/tid of TPU tracks; aggregate by name.
    per_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    # identify device pids via process_name metadata
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Device" in n
    }
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        per_op[name] += dur
        count[name] += 1
        total += dur
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntrace: {path}")
    print(f"pids: {pid_names}")
    print(f"total device-op time: {total / 1e3:.3f} ms over {nstep} steps "
          f"({total / nstep / 1e3:.3f} ms/step)\n")
    print(f"{'us/step':>10}  {'n':>4}  name")
    for name, us in rows[:48]:
        print(f"{us / nstep:>10.1f}  {count[name]:>4}  {name[:110]}")


if __name__ == "__main__":
    kv_mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fatpu_r3_decode_trace"
    outdir, nstep = run_trace(kv_mode, outdir)
    parse_trace(outdir, nstep)
