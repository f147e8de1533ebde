"""Multi-adapter LoRA for serving (and lightweight fine-tuning).

LoRA factorizes a weight update as ``W' = W + (alpha/r) * A @ B`` with
A [K, r], B [r, N], r << min(K, N).  For serving, many adapters share one
set of (possibly quantized) base weights; each request selects an adapter,
and a batched decode step applies per-slot deltas via gathered bmm — the
TPU-friendly form: the base projection stays one big MXU matmul, and the
delta adds two thin [*, r] contractions.

The reference has no model/serving layer (it is a kernel ABI); this
belongs to the BASELINE.json production-serving scope.

Shapes:
  single adapter:  A [K, r], B [r, N]
  stacked bank:    A [n, K, r], B [n, r, N]  (``stack_adapters``)
  per-slot select: ids [B] int32 into the bank's leading axis
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LORA_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def weight_kn(w) -> tuple[int, int]:
    """Original (K, N) of a float or quantized projection weight."""
    from flash_attn_tpu.ops.matmul import W8A8Weight
    from flash_attn_tpu.ops.quant import Int4Weight

    if isinstance(w, Int4Weight):
        return w.shape
    if isinstance(w, W8A8Weight):
        return w.vals.shape
    if isinstance(w, tuple):
        if w[0] == "w8a8":
            return w[1].shape
        return w[0].shape
    return w.shape


def init_lora(params, rank: int, key, *, alpha: float | None = None,
              targets=LORA_TARGETS, dtype=None):
    """Fresh LoRA tree over ``params['blocks']``: A ~ N(0, 1/r), B = 0
    (delta starts at exactly zero, the standard init).  Returns
    {"blocks": [{name: (A, B)}], "scaling": alpha/r}."""
    dt = jnp.dtype(dtype) if dtype is not None else None
    blocks = []
    for blk in params["blocks"]:
        entry = {}
        for name in targets:
            K, N = weight_kn(blk[name])
            key, k1 = jax.random.split(key)
            d = dt or (blk[name].dtype if hasattr(blk[name], "dtype")
                       else jnp.float32)
            A = jax.random.normal(k1, (K, rank), d) * (rank ** -0.5)
            entry[name] = (A, jnp.zeros((rank, N), d))
        blocks.append(entry)
    return {
        "blocks": blocks,
        "scaling": float(alpha if alpha is not None else rank) / rank,
    }


def stack_adapters(adapters: list):
    """Stack same-structure LoRA trees into a serving bank:
    leaves (A, B) -> (A [n, K, r], B [n, r, N]).  All adapters must share
    rank, targets, and scaling."""
    if not adapters:
        raise ValueError("need at least one adapter")
    scals = {a["scaling"] for a in adapters}
    if len(scals) != 1:
        raise ValueError(f"adapters disagree on scaling: {scals}")
    blocks = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[a["blocks"] for a in adapters]
    )
    return {"blocks": blocks, "scaling": scals.pop()}


def lora_delta(x, ab, ids, scaling):
    """LoRA delta for a projection: x [..., K] -> [..., N].

    ab = (A, B); 2-D leaves apply one adapter to the whole batch, 3-D
    leaves (a stacked bank) gather per-slot adapters by ``ids`` [B] and
    run batched thin matmuls.  ids may also be a scalar index into a bank
    (whole batch uses that adapter — the prefill case)."""
    A, B = ab
    dt = x.dtype
    if A.ndim == 3:
        if ids is None:
            raise ValueError("stacked LoRA bank needs adapter ids")
        if jnp.ndim(ids) == 0:
            A, B = A[ids], B[ids]
        else:
            Ab = A[ids].astype(dt)  # [B, K, r]
            Bb = B[ids].astype(dt)  # [B, r, N]
            t = jnp.einsum("btk,bkr->btr", x, Ab)
            return jnp.einsum("btr,brn->btn", t, Bb) * scaling
    return ((x @ A.astype(dt)) @ B.astype(dt)) * scaling


def merge_lora(params, lora):
    """Fold a single (unstacked, float-base) LoRA into the base weights —
    the zero-overhead single-adapter deployment path and the test oracle
    for the batched delta."""
    out = {k: v for k, v in params.items()}
    out["blocks"] = []
    for blk, lblk in zip(params["blocks"], lora["blocks"]):
        nb = dict(blk)
        for name, (A, B) in lblk.items():
            w = blk[name]
            if not isinstance(w, jax.Array):
                raise ValueError(
                    f"merge_lora needs float base weights, got {type(w)} "
                    f"for {name}; serve quantized bases unmerged instead"
                )
            nb[name] = (
                w.astype(jnp.float32)
                + lora["scaling"] * (A.astype(jnp.float32)
                                     @ B.astype(jnp.float32))
            ).astype(w.dtype)
        out["blocks"].append(nb)
    return out
