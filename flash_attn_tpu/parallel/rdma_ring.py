"""Ring attention with per-step Pallas RDMA (SURVEY.md §7 hard part (c)).

The shard_map ring in parallel/ring.py moves whole KV shards between scan
steps with ``ppermute`` — XLA-level double buffering.  This module is the
kernel-level version: ONE pallas_call per device runs the entire ring, and
the KV shard for step t+1 is pushed to the right neighbor with
``pltpu.make_async_remote_copy`` issued at the START of step t, so the ICI
transfer rides under step t's attention compute inside the kernel itself —
the Pallas analog of the reference's stream-level comm/compute overlap
(flash_attn.h:32: kernels enqueue on the caller's hipStream_t and the
caller overlaps).

Protocol per ring step t (cur = t%2 is the active KV slot, nxt = 1-cur):

  first grid cell of step t (b == h == qb == 0):
    1. wait my OWN send of step t-1 (slot nxt): the left neighbor is about
       to RDMA into my buf[nxt] during its step t — my previous send out of
       that slot must have drained first;
    2. neighbor barrier (signal left+right, wait 2): nobody starts step t's
       RDMA until both neighbors finished step t-1's compute — the writes
       into buf[nxt] can then never race reads of step t-1;
    3. start RDMA buf[cur] -> right neighbor's buf[nxt]  (skipped on the
       last step), then wait recv of buf[cur] (t > 0) before any compute.
  every grid cell: one online-softmax attention block vs buf[cur], merged
  into fp32 out/lse accumulators in HBM via the LSE algebra
  (flash_attn.h:16 — the same merge as ops/lse.lse_merge2).

Correctness is validated on the CPU interpreter's cross-device semantics
(pltpu.InterpretParams under a multi-device shard_map, tests/test_parallel.py);
PERF IS ENV-BLOCKED: this environment has one physical chip and no ICI, so
the overlap claim can only be benchmarked on a real slice.  The KV double
buffer lives in VMEM scratch — fine up to ~2 MB shards; production sizes
(8k x 8 x 128 bf16 = 16 MB) need HBM staging buffers + per-block VMEM
copies, noted for the day real ICI is available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

NEG_INF = float("-inf")


def _kernel(
    my_ref,  # [1] int32 scalar prefetch: my ring position
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, S_loc, Hk, D] local shard (step-0 source)
    v_ref,
    o_ref,  # [B, H, S_loc, D] in ANY space — written once, at the last step
    kv_buf,  # VMEM [2, 2, B, S_loc, Hk, D]: (slot, k/v, ...)
    acc,  # VMEM [B, H, S_loc, D] fp32 running merged output
    lse,  # VMEM [B, H, S_loc, 1] fp32 running LSE
    send_sem,  # DMA sems [2]
    recv_sem,
    *,
    n: int,
    causal: bool,
    scale: float,
    group: int,
    block_q: int,
    collective_id: int,
):
    t = pl.program_id(0)
    b = pl.program_id(1)
    h = pl.program_id(2)
    qb = pl.program_id(3)
    nb = pl.num_programs(1)
    nh = pl.num_programs(2)
    nqb = pl.num_programs(3)
    my = my_ref[0]
    cur = jax.lax.rem(t, 2)
    nxt = 1 - cur
    first_cell = (b == 0) & (h == 0) & (qb == 0)
    last_cell = (
        (b == nb - 1) & (h == nh - 1) & (qb == nqb - 1)
    )

    @pl.when(first_cell & (t == 0))
    def _load_local():
        # stage the local shard into slot 0 (plain VMEM copy)
        kv_buf[0, 0] = k_ref[...]
        kv_buf[0, 1] = v_ref[...]

    @pl.when(first_cell)
    def _comm():
        left = jax.lax.rem(my + n - 1, n)
        right = jax.lax.rem(my + 1, n)

        def _rdma(src_slot, dst_slot):
            # descriptor for the step whose active slot is src_slot; also
            # reconstructed at wait time (sems + byte counts must match)
            return pltpu.make_async_remote_copy(
                src_ref=kv_buf.at[src_slot],
                dst_ref=kv_buf.at[dst_slot],
                send_sem=send_sem.at[src_slot],
                recv_sem=recv_sem.at[dst_slot],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        @pl.when(t > 0)
        def _drain_prev_send():
            # left neighbor will write into buf[nxt] this step; my step t-1
            # send read from that slot (slot (t-1)%2 == nxt) and must have
            # fully drained before its buffer is overwritten
            _rdma(nxt, cur).wait_send()

        # neighbor barrier: nobody RDMAs into a slot the other side might
        # still be reading
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)

        @pl.when(t < n - 1)
        def _send():
            _rdma(cur, nxt).start()

        @pl.when(t > 0)
        def _recv():
            # the KV this step consumes arrived from the left neighbor's
            # step t-1 send into slot cur
            _rdma(nxt, cur).wait_recv()

    # ---- one attention block vs the current KV shard ----
    src = jax.lax.rem(my - t + n, n)  # ring position whose KV we hold
    s_loc = k_ref.shape[1]
    hk = h // group
    rows = pl.ds(qb * block_q, block_q)
    q = q_ref[0, 0].astype(jnp.float32)  # [bq, D]
    k = kv_buf[cur, 0, b, :, hk, :]  # [S_loc, D] fp32
    v = kv_buf[cur, 1, b, :, hk, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # [bq, S_loc]

    live = jnp.bool_(True)
    if causal:
        # contiguous layout: earlier shards full, diagonal causal, later
        # shards dead (their merge contributes exp(-inf) = nothing)
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s_loc), 1)
        s = jnp.where((src < my) | ((src == my) & (col <= row)), s, NEG_INF)
        live = src <= my

    @pl.when(t == 0)
    def _init():
        acc[b, h, rows] = jnp.zeros((block_q, acc.shape[-1]), jnp.float32)
        lse[b, h, rows] = jnp.full((block_q, 1), NEG_INF, jnp.float32)

    @pl.when(live)
    def _merge():
        m_i = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_safe = jnp.maximum(m_i, NEG_INF / 2)
        p = jnp.where(
            m_i > NEG_INF / 2, jnp.exp(s - m_safe), 0.0
        )  # [bq, S_loc]
        l_i = jnp.sum(p, axis=1, keepdims=True)
        lse_i = jnp.where(
            (l_i > 0) & (m_i > NEG_INF / 2),
            m_safe + jnp.log(jnp.maximum(l_i, 1e-38)),
            NEG_INF,
        )
        o_i = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [bq, D] (un-normalized by l_i)

        lse_prev = lse[b, h, rows]  # [bq, 1]
        o_prev = acc[b, h, rows]  # [bq, D] (normalized)
        lse_new = jnp.where(
            (lse_prev > NEG_INF / 2) | (lse_i > NEG_INF / 2),
            jnp.logaddexp(lse_prev, lse_i),
            NEG_INF,
        )
        w_prev = jnp.where(
            lse_prev > NEG_INF / 2, jnp.exp(lse_prev - lse_new), 0.0
        )
        # o_i is un-normalized: exp(lse_i - lse_new) * (o_i / l_i) =
        # exp(m - lse_new) * o_i
        w_i = jnp.where(lse_i > NEG_INF / 2, jnp.exp(m_safe - lse_new), 0.0)
        acc[b, h, rows] = o_prev * w_prev + o_i * w_i
        lse[b, h, rows] = lse_new

    @pl.when(t == n - 1)
    def _emit():
        # o_ref lives in ANY/HBM space: explicit copy, not a vector store
        pltpu.sync_copy(acc.at[b, h, rows], o_ref.at[b, h, rows])


def rdma_ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 128,
    collective_id: int = 7,
    interpret: bool | None = None,
):
    """Shard-local body (inside shard_map): q [B, S_loc, H, D], k/v
    [B, S_loc, Hk, D].  Forward only (training rings use parallel/ring.py);
    returns the local out shard [B, S_loc, H, D]."""
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    batch, s_loc, num_heads, head_dim = q.shape
    hk = k.shape[2]
    group = num_heads // hk
    if scale is None:
        scale = head_dim**-0.5
    bq = min(block_q, s_loc)
    if s_loc % bq:
        raise ValueError(f"S_loc {s_loc} not divisible by block_q {bq}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    interp = pltpu.InterpretParams() if interpret else False

    grid = (n, batch, num_heads, s_loc // bq)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n=n, causal=causal, scale=float(scale), group=group,
            block_q=bq, collective_id=collective_id,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, head_dim),
                    lambda t, b, h, qb, my: (b, h, qb, 0),
                ),
                pl.BlockSpec(
                    (batch, s_loc, hk, head_dim),
                    lambda t, b, h, qb, my: (0, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (batch, s_loc, hk, head_dim),
                    lambda t, b, h, qb, my: (0, 0, 0, 0),
                ),
            ],
            # whole-array ref (no blocking): written exactly once per
            # (b, h, qb), at the last ring step — block revisiting across
            # the step axis is not a thing the pipeline has to reason about
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, 2, batch, s_loc, hk, head_dim), jnp.float32
                ),
                pltpu.VMEM((batch, num_heads, s_loc, head_dim), jnp.float32),
                pltpu.VMEM((batch, num_heads, s_loc, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_heads, s_loc, head_dim), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
            collective_id=collective_id,
        ),
        interpret=interp,
    )(
        jnp.reshape(my, (1,)),
        jnp.swapaxes(q, 1, 2).astype(jnp.float32),  # [B, H, S_loc, D]
        k.astype(jnp.float32),
        v.astype(jnp.float32),
    )
    # [B, H, S_loc, D] -> [B, S_loc, H, D]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def make_rdma_ring_attention(mesh, *, axis_name="sp", causal=False,
                             scale=None, block_q=128, interpret=None):
    """shard_map wrapper over globally-shaped [B, S, H, D] inputs sharded
    along S.  Forward-only, contiguous layout."""
    body = functools.partial(
        rdma_ring_attention, axis_name=axis_name, causal=causal, scale=scale,
        block_q=block_q, interpret=interpret,
    )
    spec = P(None, axis_name, None, None)
    return shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
