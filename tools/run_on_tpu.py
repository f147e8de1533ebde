#!/usr/bin/env python
"""Launcher for TPU scripts in the axon-relay environment.

Empirically (see .claude/skills/verify/SKILL.md):
- registration by a fresh process HANGS if it starts within ~a minute of
  another TPU process *exiting* (lingering claim teardown);
- but a LIVE idle process holding the chip does NOT block a new claimer.

So: hold the chip with a long-lived idle "holder" subprocess first (retrying
with backoff until the holder gets devices), then run the real workload as a
second subprocess while the holder stays alive.  Run the launcher itself with
PALLAS_AXON_POOL_IPS unset or not — it never imports jax.

Usage: python tools/run_on_tpu.py <script.py> [args...]
"""

import os
import signal
import subprocess
import sys
import time

HOLDER_CODE = (
    "import jax\n"
    "print('HOLDER_READY', jax.devices(), flush=True)\n"
    "import time\n"
    "time.sleep(7200)\n"
)


def start_holder(env, timeout=150):
    import selectors

    p = subprocess.Popen(
        [sys.executable, "-c", HOLDER_CODE],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # Poll stdout with a deadline: a plain readline() blocks forever on a
    # registration-hung holder, which defeats the timeout and wedges the
    # whole retry loop (observed: one hung holder stalled the launcher for
    # 50+ minutes while the relay had long since recovered).
    sel = selectors.DefaultSelector()
    sel.register(p.stdout, selectors.EVENT_READ)
    deadline = time.time() + timeout
    buf = ""
    while time.time() < deadline:
        if p.poll() is not None:
            return None
        if sel.select(timeout=1.0):
            chunk = p.stdout.readline()
            if not chunk:  # EOF
                return None
            buf += chunk
            if "HOLDER_READY" in buf:
                return p
    p.send_signal(signal.SIGTERM)
    try:
        p.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass
    return None


def main():
    if len(sys.argv) < 2:
        print("usage: run_on_tpu.py <script.py> [args...]", file=sys.stderr)
        return 2
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = f"{repo}:{env['PYTHONPATH']}"
    # The launcher itself must run with PALLAS_AXON_POOL_IPS unset (or its
    # own startup would claim the chip); children need it restored.
    if not env.get("PALLAS_AXON_POOL_IPS"):
        env["PALLAS_AXON_POOL_IPS"] = env.get("FATPU_POOL_IPS", "127.0.0.1")

    holder = None
    for attempt in range(10):
        holder = start_holder(env)
        if holder is not None:
            break
        wait = min(45 * (attempt + 1), 180)
        print(f"[run_on_tpu] holder attempt {attempt} failed; sleeping {wait}s",
              file=sys.stderr, flush=True)
        time.sleep(wait)
    if holder is None:
        print("[run_on_tpu] TPU never became claimable", file=sys.stderr)
        return 3

    try:
        r = subprocess.run([sys.executable] + sys.argv[1:], env=env)
        return r.returncode
    finally:
        holder.send_signal(signal.SIGTERM)
        try:
            holder.wait(timeout=30)
        except subprocess.TimeoutExpired:
            holder.kill()


if __name__ == "__main__":
    sys.exit(main())
