"""Profiling + roofline accounting (SURVEY.md §5 tracing/profiling).

- trace(): context manager around jax.profiler for Perfetto traces;
- Roofline: per-kernel bytes/flops accounting against chip peaks, feeding
  the BASELINE "% of attention roofline" metric;
- benchmark(): robust wall-clock timing of jitted functions (median over
  iters, block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import numpy as np

# Per-chip peaks: (bf16 TFLOP/s, int8 TOP/s, HBM GB/s)
CHIP_PEAKS = {
    "v4": (275.0, 275.0, 1228.0),
    "v5e": (197.0, 394.0, 819.0),
    "v5p": (459.0, 918.0, 2765.0),
    "v6e": (918.0, 1836.0, 1640.0),
    "cpu": (0.5, 0.5, 50.0),
}


def chip_kind() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "lite" in kind:
        return "v5e" if "v5" in kind else "v6e"
    for name in CHIP_PEAKS:
        if name in kind:
            return name
    if d.platform == "cpu":
        return "cpu"
    # Fail loudly: silently defaulting to some chip's peaks would mis-scale
    # every roofline fraction on unrecognized hardware.  Override with
    # FATPU_CHIP if the table genuinely lacks your chip.
    import os

    override = os.environ.get("FATPU_CHIP")
    if override:
        if override not in CHIP_PEAKS:
            raise ValueError(
                f"FATPU_CHIP={override!r} not in CHIP_PEAKS "
                f"({sorted(CHIP_PEAKS)})"
            )
        return override
    raise ValueError(
        f"unrecognized TPU device_kind {kind!r}; set FATPU_CHIP to one of "
        f"{sorted(CHIP_PEAKS)} or add its peaks to CHIP_PEAKS"
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fatpu_trace"):
    """jax.profiler trace context (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median wall-clock seconds of fn(*args) with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@dataclass
class Roofline:
    """Operation cost model vs chip peaks."""

    flops: float
    bytes: float
    chip: str = ""

    def __post_init__(self):
        if not self.chip:
            self.chip = chip_kind()

    @property
    def peaks(self):
        return CHIP_PEAKS[self.chip]

    @property
    def ideal_seconds(self) -> float:
        tflops, _, gbs = self.peaks
        return max(self.flops / (tflops * 1e12), self.bytes / (gbs * 1e9))

    @property
    def compute_bound(self) -> bool:
        tflops, _, gbs = self.peaks
        return self.flops / (tflops * 1e12) > self.bytes / (gbs * 1e9)

    def fraction(self, measured_seconds: float) -> float:
        return self.ideal_seconds / measured_seconds

    def report(self, measured_seconds: float) -> dict:
        return {
            "chip": self.chip,
            "bound": "compute" if self.compute_bound else "memory",
            "ideal_us": round(self.ideal_seconds * 1e6, 2),
            "measured_us": round(measured_seconds * 1e6, 2),
            "roofline_frac": round(self.fraction(measured_seconds), 4),
            "tflops": round(self.flops / measured_seconds / 1e12, 2),
            "gbs": round(self.bytes / measured_seconds / 1e9, 2),
        }


def attention_fwd_cost(batch, sq, sk, heads, head_dim, *, causal=False,
                       dtype_bytes=2, kv_heads=None, lse=True):
    """Roofline inputs for the FA2 forward kernel."""
    kv_heads = kv_heads or heads
    pairs = sq * sk * (0.5 if causal else 1.0)
    flops = 4 * batch * heads * pairs * head_dim
    bytes_ = (
        batch * sq * heads * head_dim * dtype_bytes * 2  # q + out
        + batch * sk * kv_heads * head_dim * dtype_bytes * 2  # k + v
        + (batch * heads * sq * 4 if lse else 0)
    )
    return Roofline(flops=flops, bytes=bytes_)


def decode_cost(batch, sk, heads, kv_heads, head_dim, *, kv_bytes=2,
                scale_bytes=0):
    """Decode attention is KV-bandwidth-bound."""
    flops = 4 * batch * heads * sk * head_dim
    bytes_ = 2 * batch * sk * kv_heads * (head_dim * kv_bytes + scale_bytes)
    return Roofline(flops=flops, bytes=bytes_)
