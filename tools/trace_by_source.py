"""Aggregate a jax.profiler trace's device-op time by source file:line.

Usage: python tools/trace_by_source.py <trace_dir> <n_steps>
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def aggregate(outdir, nstep=1, top=40):
    path = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Device" in n}
    per_src = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (dev_pids and e.get("pid") not in dev_pids):
            continue
        name = e.get("name", "?")
        # skip scope/aggregate events (jit_f, top-level while)
        if name.startswith("jit_") or name.split(".")[0] == "while":
            # whiles inside pallas kernels count via their closed_call parent
            continue
        args = e.get("args", {})
        src = args.get("source", "")
        cat = args.get("hlo_category", "")
        key = f"{src or '<no-src>'} [{cat}] {name.split('.')[0]}"
        dur = float(e.get("dur", 0.0))
        per_src[key] += dur
        cnt[key] += 1
        total += dur
    rows = sorted(per_src.items(), key=lambda kv: -kv[1])
    print(f"{path}\nleaf total: {total / nstep / 1e3:.3f} ms/step\n")
    print(f"{'us/step':>9}  {'n':>4}  source [category] op")
    for k, us in rows[:top]:
        print(f"{us / nstep:>9.1f}  {cnt[k]:>4}  {k[:140]}")


if __name__ == "__main__":
    aggregate(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
