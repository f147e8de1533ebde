"""Kernel block-size selection (SURVEY.md §5 config system: "kernel
block-size autotuning table keyed by (head_size, seq bucket, dtype)").

Two layers:
- a static heuristic table (good defaults measured on v5e) used by default;
- an online autotuner that benchmarks candidate FlashConfigs on the live
  chip and caches winners per key (used by the bench harness; results can
  be persisted and shipped as the static table).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import jax

from flash_attn_tpu.ops.flash_fwd import FlashConfig


def _seq_bucket(s: int) -> int:
    for b in (512, 1024, 2048, 4096, 8192):
        if s <= b:
            return b
    return 16384


def heuristic_config(seqlen_q: int, seqlen_k: int, head_dim: int,
                     dtype) -> FlashConfig:
    """Static defaults measured on v5e (round-2 sweep at the 8B prefill
    shape): 1024x1024 wins (114.9 TF/s vs 96.6 at 512x1024 and 55.9 at
    1024x512); 2048-wide q blocks exceed VMEM at head_dim 128.  Shorter
    sequences keep the round-1 table."""
    if seqlen_q >= 4096 and seqlen_k >= 4096 and head_dim <= 128:
        return FlashConfig(block_q=1024, block_k=1024)
    if seqlen_k >= 2048:
        block_k = 1024
    elif seqlen_k >= 512:
        block_k = 512
    else:
        block_k = 128
    if seqlen_q >= 2048 and head_dim <= 128:
        block_q = 512
    elif seqlen_q >= 512:
        block_q = 256
    else:
        block_q = 128
    return FlashConfig(block_q=block_q, block_k=block_k)


_CACHE_PATH = os.environ.get(
    "FATPU_AUTOTUNE_CACHE", os.path.expanduser("~/.cache/fatpu_autotune.json")
)
_cache: dict | None = None


def _load_cache() -> dict:
    global _cache
    if _cache is None:
        try:
            with open(_CACHE_PATH) as f:
                _cache = json.load(f)
        except (OSError, ValueError):
            _cache = {}
    return _cache


def _key(seqlen_q, seqlen_k, head_dim, dtype):
    return f"{_seq_bucket(seqlen_q)}x{_seq_bucket(seqlen_k)}x{head_dim}x{dtype}"


def get_config(seqlen_q: int, seqlen_k: int, head_dim: int, dtype="bfloat16"
               ) -> FlashConfig:
    cache = _load_cache()
    hit = cache.get(_key(seqlen_q, seqlen_k, head_dim, str(dtype)))
    if hit:
        return FlashConfig(**hit)
    return heuristic_config(seqlen_q, seqlen_k, head_dim, dtype)


def get_bwd_config(seqlen_q: int, seqlen_k: int, head_dim: int,
                   dtype="bfloat16") -> FlashConfig:
    """Block config for the backward kernels.  The bwd passes hold more live
    tiles per step (q, k, v, dout + two fp32 scratch accumulators) than fwd,
    so blocks are smaller.  The dropout mask is keyed on absolute element
    coords, so fwd and bwd may tile differently without breaking replay."""
    cache = _load_cache()
    hit = cache.get("bwd:" + _key(seqlen_q, seqlen_k, head_dim, str(dtype)))
    if hit:
        return FlashConfig(**hit)
    # r2q sweep at the 8B prefill shape (S=8192, D=128): 1024x512 wins at
    # 166.6 TF/s = 0.846 of peak (vs 143.6 at the old 256x512 default);
    # wide-q beats wide-k for bwd because the dkv pass re-reads q/dout per
    # k block and its 5-GEMM body amortizes better over tall tiles.
    if seqlen_q >= 2048 and seqlen_k >= 1024 and head_dim <= 128:
        return FlashConfig(block_q=1024, block_k=512)
    block_k = 512 if seqlen_k >= 1024 else (256 if seqlen_k >= 256 else 128)
    block_q = 256 if seqlen_q >= 512 and head_dim <= 128 else 128
    return FlashConfig(block_q=block_q, block_k=block_k)


def autotune_fwd(q, k, v, *, causal=True, candidates=None, iters=5) -> FlashConfig:
    """Measure candidate configs on the live device; cache + return the
    winner.  Uses chained-iteration timing (see bench.py methodology)."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.ops.flash_fwd import flash_fwd

    candidates = candidates or [
        FlashConfig(block_q=bq, block_k=bk)
        for bq in (128, 256)
        for bk in (128, 256, 512)
        if bk <= max(k.shape[1], 128)
    ]
    best, best_t = None, float("inf")
    for cfg in candidates:
        try:
            fn = jax.jit(
                lambda q_, cfg=cfg: jnp.sum(
                    jax.lax.fori_loop(
                        0,
                        8,
                        lambda i, c: flash_fwd(c, k, v, causal=causal, config=cfg)[0],
                        q_,
                    ).astype(jnp.float32)
                )
            )
            float(fn(q))  # compile
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(fn(q))
                times.append(time.perf_counter() - t0)
            t = float(np.median(times))
        except Exception:
            continue
        if t < best_t:
            best, best_t = cfg, t
    best = best or heuristic_config(q.shape[1], k.shape[1], q.shape[3], q.dtype)
    cache = _load_cache()
    cache[_key(q.shape[1], k.shape[1], q.shape[3], str(q.dtype))] = asdict(best)
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return best
