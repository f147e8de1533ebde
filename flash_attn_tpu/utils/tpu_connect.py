"""Robust TPU attachment for the axon-tunnel environment.

The ambient sitecustomize auto-registers the axon PJRT plugin, but the single
chip's claim lingers ~O(1 min) after a process exits; a process started in
that window gets a swallowed registration failure and later sees
"Backend 'axon' is not in the list of known backends".  ensure_tpu() retries
manual registration until the chip is claimable (or falls back to CPU).
"""

from __future__ import annotations

import os
import time
import uuid


def ensure_tpu(max_wait_s: float = 420.0, poll_s: float = 20.0) -> str:
    """Returns the usable backend name ('axon'/'tpu'/'cpu')."""
    import jax

    def tpu_ok() -> bool:
        try:
            return any(d.platform != "cpu" for d in jax.devices())
        except RuntimeError:
            return False

    if tpu_ok():
        return jax.default_backend()

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        return "cpu"

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    deadline = time.time() + max_wait_s
    last_err = None
    while time.time() < deadline:
        try:
            from axon.register import register

            register(
                None,
                f"{gen}:1x1x1",
                so_path="/opt/axon/libaxon_pjrt.so",
                session_id=str(uuid.uuid4()),
                remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
            )
        except Exception as e:  # noqa: BLE001 — registration may already exist
            last_err = e
            if "cannot change" in str(e) or "already registered" in str(e):
                # The per-process registration OnceLock is burned (the
                # startup claim failed); only a fresh process can retry —
                # callers should use run_with_tpu_retry() at the process
                # level. Nothing more we can do here.
                raise RuntimeError(
                    "TPU registration burned in this process; retry from a "
                    "fresh process (see run_with_tpu_retry)"
                ) from e
        if tpu_ok():
            return jax.default_backend()
        time.sleep(poll_s)
    raise RuntimeError(
        f"TPU did not become claimable within {max_wait_s}s; last error: {last_err!r}"
    )


def tpu_available() -> bool:
    """True iff this process can use the TPU right now (no retries)."""
    import jax

    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def run_with_tpu_retry(script_path: str, child_env_flag: str,
                       attempts: int = 8, sleep_s: float = 45.0) -> int:
    """Process-level retry for the stale-claim race.

    Call from a script whose own TPU registration failed at startup: spawns
    fresh child processes (which re-run sitecustomize registration) until one
    succeeds. The caller must exit immediately after (its own registration is
    unusable).  Children see ``child_env_flag=1`` and must not recurse.
    Returns the exit code of the last child.
    """
    import subprocess
    import sys

    code = 1
    for _ in range(attempts):
        env = dict(os.environ)
        env[child_env_flag] = "1"
        proc = subprocess.run([sys.executable, script_path], env=env)
        code = proc.returncode
        if code == 0:
            return 0
        time.sleep(sleep_s)
    return code
