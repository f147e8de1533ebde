"""Multi-host bring-up (SURVEY.md §5 distributed backend, B9).

One call per host process: initialize() joins the jax.distributed cluster
(ICI within a slice, DCN across slices), then meshes built from
jax.devices() span the full slice and every pjit/shard_map collective in the
library rides the fabric.  There is no NCCL/MPI analog to manage — the XLA
runtime is the backend.

Failure story (SURVEY.md §5): no elastic membership; a host failure kills
the job and restart resumes from the latest checkpoint
(utils/checkpoint.py).
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Join the multi-host cluster; no-ops on single-process setups.

    On Cloud TPU the three args auto-detect from the metadata server; pass
    them explicitly elsewhere.  Returns a summary dict.
    """
    if num_processes == 1 or (
        coordinator_address is None
        and "COORDINATOR_ADDRESS" not in os.environ
        and jax.process_count() == 1
    ):
        return _summary()
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )
    return _summary()


def _summary() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    return jax.process_index() == 0
