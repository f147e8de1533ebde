"""Ulysses-style sequence parallelism: all-to-all head<->sequence reshard.

The alternative to ring attention when num_heads >= ring size (SURVEY.md §5
long-context): tokens arrive sequence-sharded; one all_to_all redistributes
so each device holds *all* tokens for a subset of heads, runs the ordinary
flash kernel locally (exact, no per-step merging), and a second all_to_all
restores sequence sharding.  Two collectives total vs n-1 ppermutes — wins
when ICI all-to-all bandwidth is plentiful and head count divides evenly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flash_attn_tpu.ops.attention import flash_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: float | None = None,
    bias: jax.Array | None = None,
    window: tuple[int, int] | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    interpret: bool | None = None,
):
    """Shard-local body (inside shard_map): q/k/v local shards
    [B, S_loc, H, D]; heads H must be divisible by the axis size.

    Full feature parity with the single-device kernel (flash_attn.h:26,
    33-36 on the distributed surface): after the all-to-all each device
    holds the WHOLE sequence for its head subset, so bias / window /
    softcap / dropout apply via the ordinary kernel.  ``bias`` arrives
    head-sharded ([B, H/n, S, S] local) since that's the post-a2a layout.
    Dropout seeds are offset by the device's axis index so head subsets
    draw independent masks (the kernel mixes the LOCAL head id); the seed
    is a traced operand of the attention core, so backward replay is exact.
    """
    n = jax.lax.axis_size(axis_name)
    if q.shape[2] % n:
        raise ValueError(f"num_heads {q.shape[2]} not divisible by axis size {n}")
    hk = k.shape[2]
    if hk % n:
        if n % hk:
            raise ValueError(
                f"num_kv_heads {hk} and axis size {n} must divide one way"
            )
        # MQA/GQA with fewer KV heads than devices: replicate KV heads so
        # the all-to-all leaves each device exactly one (replicated) KV
        # head.  Exact — GQA repeats KV across query groups anyway, and the
        # device-d query heads' group index matches replica d (both floor
        # to d // rep).  Costs rep x the KV comm volume; KV is the small
        # side under GQA, so Ulysses stays cheaper than materialised
        # repeat-to-H.
        rep = n // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    # seq-sharded -> head-sharded: split heads across devices, gather seq.
    def to_heads(x):
        # [B, S_loc, H, D] -> [B, S, H/n, D]
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def to_seq(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qh = to_heads(q)
    kh = to_heads(k)
    vh = to_heads(v)
    seed = jnp.asarray(dropout_seed, jnp.int32) + jax.lax.axis_index(
        axis_name
    ).astype(jnp.int32)
    # public API (custom_vjp) so the whole sequence-parallel path is
    # differentiable: all_to_all transposes under AD automatically.
    out = flash_attention(
        qh, kh, vh, causal=causal, scale=scale, mask=bias, window=window,
        logit_softcap=logit_softcap, dropout_rate=dropout_rate,
        dropout_seed=seed, interpret=interpret,
    )
    return to_seq(out)


def make_ulysses_attention(mesh, *, axis_name="sp", causal=False, scale=None,
                           has_bias=False, window=None, logit_softcap=None,
                           dropout_rate=0.0, interpret=None):
    body = functools.partial(
        ulysses_attention, axis_name=axis_name, causal=causal, scale=scale,
        window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    spec = P(None, axis_name, None, None)
    if has_bias:
        # bias is consumed head-sharded (the post-a2a layout)
        bias_spec = P(None, axis_name, None, None)
        return jax.shard_map(
            lambda q, k, v, bias: body(q, k, v, bias=bias),
            mesh=mesh,
            in_specs=(spec, spec, spec, bias_spec),
            out_specs=spec,
            check_vma=False,
        )
    return jax.shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
