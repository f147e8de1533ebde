"""Mesh construction and sharding helpers.

The reference's distribution story is "the caller owns the stream"
(hipStream_t, flash_attn.h:32) — scaling lived in the consumer framework
(NCCL/RCCL).  TPU-native scaling is declarative: build a Mesh over
(data, fsdp?, tensor, sequence) axes, annotate shardings, and let XLA place
collectives on ICI/DCN (SURVEY.md §5 distributed backend).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
TENSOR_AXIS = "tp"
SEQUENCE_AXIS = "sp"
EXPERT_AXIS = "ep"


@dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    tp: int = 1
    sp: int = 1

    @property
    def size(self):
        return self.dp * self.tp * self.sp


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(tp=len(devices))
    if cfg.size > len(devices):
        raise ValueError(f"mesh {cfg} needs {cfg.size} devices, have {len(devices)}")
    devs = np.asarray(devices[: cfg.size]).reshape(cfg.dp, cfg.tp, cfg.sp)
    return Mesh(devs, (DATA_AXIS, TENSOR_AXIS, SEQUENCE_AXIS))


def shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def host_local_mesh(n: int = 8) -> Mesh:
    """Testing helper: mesh over the first n (virtual CPU) devices, all on
    the tensor axis unless reshaped by the caller."""
    return make_mesh(MeshConfig(tp=n))
