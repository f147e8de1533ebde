"""Sharded checkpoint/resume via orbax (SURVEY.md §5 checkpoint/resume).

Policy: params (and optionally optimizer state) checkpoint; KV-cache state is
reconstructible from the request log and is NOT checkpointed.  Multi-host
failure recovery = restart-from-checkpoint (idiomatic for TPU slices, vs
elastic membership).
"""

from __future__ import annotations

import os

import jax


def save(path: str, pytree, *, force: bool = True):
    """Save a pytree (sharded arrays supported) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, pytree, force=force)
    ckptr.wait_until_finished()


def load(path: str, like=None):
    """Restore a pytree; ``like`` (a matching abstract/real pytree) restores
    shardings and dtypes when given."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        like,
    )
    return ckptr.restore(path, abstract)


class TrainCheckpointManager:
    """Step-numbered checkpoints with retention, for training loops."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state):
        import orbax.checkpoint as ocp

        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, like=None):
        import orbax.checkpoint as ocp

        step = self.mgr.latest_step()
        if step is None:
            return None, None
        if like is None:
            return step, self.mgr.restore(step)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            like,
        )
        return step, self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
