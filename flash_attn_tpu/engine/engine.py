"""Inference engine: continuous batching over jitted prefill/decode steps
(B10; BASELINE.json "continuous batching scheduler, prefill/decode
interleave, sampler").

Two jitted device functions, fixed shapes (recompilation is the TPU enemy):
- prefill_one: (params, tokens [1, S_bucket], cache, slot, true_len) — runs
  the model on one padded prompt and writes its KV into the slot,
- decode_batch: (params, tokens [B], cache, key) — one token for every slot;
  inactive slots are masked by kv_length and ignored by the scheduler.

The host loop (ContinuousBatchingScheduler) admits requests into slots as
they free up, so decode batches stay full — the reference-side analog is
varlen packing (flash_attn.h:38-66) feeding one kernel launch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.engine.kv_cache import KVCache
from flash_attn_tpu.engine.sampler import SamplingParams, sample
from flash_attn_tpu.engine.scheduler import (
    ContinuousBatchingScheduler,
    Request,
    bucket_length,
)


@dataclass
class SpecConfig:
    """Speculative decoding: n-gram (prompt-lookup) or draft-model.

    Host-side n-gram drafting (default): the last ``ngram`` tokens of a
    request's history (prompt + generated) are searched for a prior
    occurrence; the tokens that followed it are proposed as ``num_draft``
    drafts.  Verification is ONE decode_multi call scoring [current
    token, drafts] against the KV cache in a single sweep
    (ops/decode.py flash_decode_chunk); the longest draft prefix agreeing
    with greedy argmax is accepted plus the model's own correction token,
    so greedy output is preserved EXACTLY — speculation is a pure latency
    optimization.  Used only when sampling.temperature == 0 (greedy);
    stochastic sampling falls back to regular decode.

    Draft-model drafting: set ``draft_params`` + ``draft_adapter`` (a
    smaller model over the SAME vocabulary).  The engine keeps a second
    KV cache for the draft, prefills it alongside the target at
    admission, and each round runs num_draft+1 batched draft decode
    steps in one dispatch (the +1 appends the last draft's KV so the
    draft cache mirrors decode_multi's K+1 appended entries; both caches
    roll back to the accepted length identically).  Verification and the
    greedy-exactness guarantee are unchanged — a bad draft model can
    only cost speed, never tokens.
    """

    num_draft: int = 4
    ngram: int = 2
    draft_params: object = None
    draft_adapter: object = None  # ModelAdapter of the draft model


def _ngram_draft(history: list[int], n: int, k: int) -> list[int]:
    """Prompt-lookup draft: continue the most recent prior occurrence of
    the trailing n-gram; degenerate fallback repeats the last token (a
    wrong draft only costs its share of the single verify sweep)."""
    if len(history) > n:
        pat = history[-n:]
        for j in range(len(history) - n - 1, -1, -1):
            if history[j : j + n] == pat:
                cont = history[j + n : j + n + k]
                if cont:
                    return (cont + [cont[-1]] * k)[:k]
    return [history[-1]] * k


@dataclass
class ModelAdapter:
    """What the engine needs from a model family."""

    # (params, tokens [1, S], positions [1, S]) -> (logits_last [1, V],
    #  kvs: list of (k, v) [1, S, Hk, D] per layer)
    prefill_with_kv: Callable
    # (params, token [B], cache) -> (logits [B, V], cache)
    decode_step: Callable
    num_layers: int
    num_kv_heads: int
    head_dim: int
    eos_token: int | None = None
    # optional chunked prefill: (params, tokens [1, C], cache, slot, start)
    # -> (logits [1, C, V], cache) — enables prefill/decode interleave on
    # long prompts (no head-of-line blocking).
    prefill_chunk: Callable | None = None
    # optional paged decode: (params, token [B], pool: PagedKVPool) ->
    # (logits [B, V], pool) — used by PagedInferenceEngine.
    decode_step_paged: Callable | None = None
    # optional packed varlen prefill: (params, tokens [1, T], positions
    # [1, T], segment_ids [1, T]) -> (logits [1, T, V], kvs) — several
    # prompts through one kernel launch (flash_attn.h:38-66 engine-side).
    prefill_packed: Callable | None = None
    # optional multi-token decode: (params, tokens [B, T], cache) ->
    # (logits [B, T, V], cache) — the speculative-decoding verify step
    # (appends all T tokens' KV, scores every position in one cache sweep).
    decode_multi: Callable | None = None
    # optional prefix-cache suffix prefill: (params, tokens [1, C],
    # pool: PagedKVPool, slot, start) -> (logits [1, C, V], pool) — prefill
    # only the divergent suffix when a prompt's prefix pages are shared
    # (engine/prefix_cache.py).
    prefill_suffix_paged: Callable | None = None
    # optional multi-adapter LoRA paths (models/lora.py stacked bank):
    # (params, tokens, positions, bank, adapter_id) -> (logits, kvs) and
    # (params, token [B], cache, bank, ids [B]) -> (logits, cache).
    prefill_with_kv_lora: Callable | None = None
    decode_step_lora: Callable | None = None


class InferenceEngine:
    def __init__(
        self,
        params,
        adapter: ModelAdapter,
        *,
        max_batch: int = 8,
        capacity: int = 2048,
        kv_mode: str = "none",
        cache_dtype=jnp.bfloat16,
        sampling: SamplingParams | None = None,
        rng_seed: int = 0,
        prefill_chunk_size: int | None = None,
        spec: SpecConfig | None = None,
        mesh=None,
        kv_shard_axis: str = "sp",
        lora_bank=None,
        decode_burst: int = 1,
    ):
        """decode_burst: decode up to this many tokens per device dispatch
        (one jitted lax.scan instead of one host round-trip per token —
        multi-step scheduling).  A burst fires only when the waiting queue
        is empty and every active slot has >= burst tokens of budget and KV
        headroom, so admission latency and max_tokens stay exact; a slot
        hitting EOS mid-burst discards its tail tokens (the over-appended
        KV is masked by length once the slot is reused).  Production knob
        for host-latency-dominated deployments (the axon relay pays ~30 ms
        per dispatch; burst=8 cuts per-token host cost 8x)."""
        self.params = params
        self.adapter = adapter
        self.lora_bank = lora_bank
        if lora_bank is not None:
            if (adapter.prefill_with_kv_lora is None
                    or adapter.decode_step_lora is None):
                raise ValueError("lora_bank needs the adapter's lora paths")
            if spec is not None or prefill_chunk_size is not None:
                raise ValueError(
                    "lora_bank does not compose with speculative decoding "
                    "or chunked prefill yet"
                )
        self.capacity = capacity
        self.sampling = sampling or SamplingParams()
        if spec is not None and adapter.decode_multi is None:
            raise ValueError("spec decoding needs adapter.decode_multi")
        self.spec = spec
        self.draft_cache = None
        if spec is not None and spec.draft_adapter is not None:
            da = spec.draft_adapter
            if da.prefill_with_kv is None or da.decode_step is None:
                raise ValueError(
                    "draft-model speculation needs the draft adapter's "
                    "prefill_with_kv and decode_step"
                )
            if mesh is not None:
                raise ValueError(
                    "draft-model speculation does not compose with "
                    "sharded KV yet"
                )
            if prefill_chunk_size is not None:
                raise ValueError(
                    "draft-model speculation does not compose with "
                    "chunked prefill yet"
                )
            # the draft's own cache: unquantized (the draft is small; its
            # exactness keeps acceptance high)
            self.draft_cache = KVCache.create(
                da.num_layers, max_batch, capacity, da.num_kv_heads,
                da.head_dim, dtype=cache_dtype, mode="none",
            )
            self._draft_prefill_jit = jax.jit(
                self._draft_prefill_one, donate_argnums=(2,)
            )
            self._draft_scan_jit = jax.jit(
                self._draft_scan, donate_argnums=(2,)
            )
            # one plain draft step: keeps the draft cache in lockstep on
            # rounds where spec falls back to regular decode (headroom)
            self._draft_sync_jit = jax.jit(
                da.decode_step, donate_argnums=(2,)
            )
        self.mesh = mesh
        self.kv_shard_axis = kv_shard_axis
        self.sched = ContinuousBatchingScheduler(max_batch)
        self.cache = KVCache.create(
            adapter.num_layers, max_batch, capacity, adapter.num_kv_heads,
            adapter.head_dim, dtype=cache_dtype, mode=kv_mode,
            # natural scale-lane order when the capacity axis is sharded:
            # shard-local decode can't interpret permuted chunks that
            # straddle shard boundaries
            scale_perm_chunk=None if mesh is not None else "auto",
        )
        if mesh is not None:
            # Sequence-sharded KV (BASELINE configs 3-4): the capacity axis
            # of every cache buffer lives split across the mesh; decode
            # merges per-shard partials via the adapter's sharded decode
            # path (models pass the same mesh to make_adapter).
            from jax.sharding import NamedSharding, PartitionSpec as P

            if capacity % mesh.shape[kv_shard_axis] != 0:
                raise ValueError(
                    f"capacity {capacity} not divisible by mesh axis "
                    f"{kv_shard_axis}={mesh.shape[kv_shard_axis]}"
                )
            kv_s = NamedSharding(mesh, P(None, None, kv_shard_axis, None))
            # lane-dense scales carry S on the LAST axis
            sc_s = NamedSharding(mesh, P(None, None, None, kv_shard_axis))
            rep = NamedSharding(mesh, P())
            self.cache = KVCache(
                jax.device_put(self.cache.k, kv_s),
                jax.device_put(self.cache.v, kv_s),
                None if self.cache.k_scale is None
                else jax.device_put(self.cache.k_scale, sc_s),
                None if self.cache.v_scale is None
                else jax.device_put(self.cache.v_scale, sc_s),
                jax.device_put(self.cache.length, rep),
                self.cache.mode,
                self.cache.scale_perm_chunk,
            )
        self.key = jax.random.PRNGKey(rng_seed)
        self.next_token = np.zeros((max_batch,), np.int32)
        # Host mirror of cache.length, updated analytically at dispatch
        # time (prefill sets, decode/burst advances uniformly — the same
        # math the device applies), so the hot loop never pays a
        # device->host readback of the lengths for metrics/headroom.
        self._host_lens = np.zeros((max_batch,), np.int32)
        # One speculative in-flight burst: (device tokens, slot->req
        # snapshot at dispatch).  See _do_decode_step.
        self._inflight = None
        self._prefilling: set[int] = set()
        # Chunked prefill bounds how long a prompt can stall the decode
        # batch; requires the adapter's prefill_chunk path.
        self.prefill_chunk_size = (
            prefill_chunk_size if adapter.prefill_chunk is not None else None
        )
        from flash_attn_tpu.utils.metrics import EngineMetrics

        self.metrics = EngineMetrics(kv_capacity=max_batch * capacity)
        self.adapter_ids = np.zeros((max_batch,), np.int32)
        self._prefill_jit = jax.jit(self._prefill_one, donate_argnums=(2,))
        self._decode_jit = jax.jit(self._decode_batch, donate_argnums=(2,))
        self.decode_burst = max(1, int(decode_burst))
        if self.decode_burst > 1:
            if spec is not None or lora_bank is not None:
                raise ValueError(
                    "decode_burst does not compose with speculative "
                    "decoding or LoRA banks"
                )
            self._burst_jit = jax.jit(
                self._decode_burst_body, donate_argnums=(2,)
            )
        if lora_bank is not None:
            self._prefill_lora_jit = jax.jit(
                self._prefill_one_lora, donate_argnums=(2,)
            )
            self._decode_lora_jit = jax.jit(
                self._decode_batch_lora, donate_argnums=(2,)
            )
        self._chunk_jit = (
            jax.jit(adapter.prefill_chunk, donate_argnums=(2,))
            if adapter.prefill_chunk is not None
            else None
        )

    # --- jitted bodies ---

    def _prefill_one(self, params, tokens, cache: KVCache, slot, true_len):
        positions = jnp.arange(tokens.shape[1])[None]
        logits_all, kvs = self.adapter.prefill_with_kv(params, tokens, positions)
        for layer, (k, v) in enumerate(kvs):
            cache = _insert_slot_kv(cache, layer, slot, k[0], v[0])
        cache = KVCache(
            cache.k, cache.v, cache.k_scale, cache.v_scale,
            cache.length.at[slot].set(true_len), cache.mode,
            cache.scale_perm_chunk,
        )
        # logits at the last *real* token of the padded prompt
        logits = logits_all[0, true_len - 1]
        return logits, cache

    def _draft_prefill_one(self, params, tokens, cache: KVCache, slot,
                           true_len):
        """Draft-model admission prefill: KV + length only (the draft's
        first proposal comes from its decode step, seeded by the
        target's sampled first token)."""
        positions = jnp.arange(tokens.shape[1])[None]
        _, kvs = self.spec.draft_adapter.prefill_with_kv(
            params, tokens, positions
        )
        for layer, (k, v) in enumerate(kvs):
            cache = _insert_slot_kv(cache, layer, slot, k[0], v[0])
        return KVCache(
            cache.k, cache.v, cache.k_scale, cache.v_scale,
            cache.length.at[slot].set(true_len), cache.mode,
            cache.scale_perm_chunk,
        )

    def _draft_scan(self, params, toks, cache: KVCache):
        """num_draft+1 greedy draft decode steps in one dispatch: returns
        drafts [B, K].  The +1 step's logits are discarded — it exists to
        append the last draft token's KV so the draft cache holds exactly
        the K+1 entries decode_multi appends to the target cache, making
        the post-verify length rollback identical for both."""

        def step(carry, _):
            tok, c = carry
            logits, c = self.spec.draft_adapter.decode_step(params, tok, c)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, c), nxt

        (_, cache), drafts = jax.lax.scan(
            step, (toks, cache), None, length=self.spec.num_draft + 1
        )
        return jnp.swapaxes(drafts[:-1], 0, 1), cache  # [B, K]

    def _decode_batch(self, params, tokens, cache: KVCache, key):
        logits, cache = self.adapter.decode_step(params, tokens, cache)
        toks = sample(logits, key, self.sampling)
        return toks, cache

    def _decode_burst_body(self, params, tokens, cache: KVCache, key):
        """decode_burst tokens per slot in ONE dispatch (lax.scan over
        decode steps; host sees only the final cache + all sampled
        tokens)."""
        keys = jax.random.split(key, self.decode_burst)

        def step(carry, k):
            tok, c = carry
            logits, c = self.adapter.decode_step(params, tok, c)
            tok = sample(logits, k, self.sampling)
            return (tok, c), tok

        (_, cache), toks = jax.lax.scan(step, (tokens, cache), keys)
        return toks, cache  # toks [burst, B]

    def _prefill_one_lora(self, params, tokens, cache, slot, true_len,
                          bank, aid):
        positions = jnp.arange(tokens.shape[1])[None]
        logits_all, kvs = self.adapter.prefill_with_kv_lora(
            params, tokens, positions, bank, aid
        )
        for layer, (k, v) in enumerate(kvs):
            cache = _insert_slot_kv(cache, layer, slot, k[0], v[0])
        cache = KVCache(
            cache.k, cache.v, cache.k_scale, cache.v_scale,
            cache.length.at[slot].set(true_len), cache.mode,
            cache.scale_perm_chunk,
        )
        return logits_all[0, true_len - 1], cache

    def _decode_batch_lora(self, params, tokens, cache, key, bank, ids):
        logits, cache = self.adapter.decode_step_lora(
            params, tokens, cache, bank, ids
        )
        toks = sample(logits, key, self.sampling)
        return toks, cache

    # --- host loop ---

    def submit(self, prompt, max_tokens=64, adapter: int = 0) -> Request:
        """adapter: LoRA adapter index into the engine's lora_bank (ignored
        without one)."""
        return self.sched.submit(prompt, max_tokens, self.adapter.eos_token,
                                 adapter=adapter)

    def cancel(self, req: Request) -> bool:
        """Cancel a request: queued ones finish immediately; active ones
        stop (and release their slot/KV) at the next decode step."""
        return self.sched.cancel(req)

    def run(self, max_steps: int = 10_000) -> None:
        """Drive until all submitted work completes."""
        steps = 0
        while self.sched.has_work and steps < max_steps:
            steps += 1
            if self._inflight is not None and not self.sched.active:
                # everything the in-flight burst was for has completed or
                # been cancelled; its tokens are dead — drop the reference
                # (the device-side work is already booked in _host_lens)
                self._inflight = None
            admitted = self.sched.admit()
            if (
                len(admitted) >= 2
                and self.adapter.prefill_packed is not None
                and self.lora_bank is None
                and self.prefill_chunk_size is None
                and sum(len(r.prompt) for r in admitted) <= self.capacity
            ):
                # several prompts through ONE varlen kernel launch
                self._do_prefill_packed(admitted)
            else:
                for req in admitted:
                    self._do_prefill(req)
            if not self.sched.active:
                continue
            self._do_decode_step()

    def _do_prefill(self, req: Request):
        import time as _time

        t0 = _time.perf_counter()
        if (
            self.prefill_chunk_size is not None
            and len(req.prompt) > self.prefill_chunk_size
        ):
            logits = self._chunked_prefill(req)
        else:
            bucket = bucket_length(len(req.prompt))
            bucket = min(bucket, self.capacity)
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(req.prompt)] = req.prompt
            if self.lora_bank is not None:
                self.adapter_ids[req.slot] = req.adapter
                logits, self.cache = self._prefill_lora_jit(
                    self.params, jnp.asarray(toks), self.cache,
                    jnp.int32(req.slot), jnp.int32(len(req.prompt)),
                    self.lora_bank, jnp.int32(req.adapter),
                )
            else:
                logits, self.cache = self._prefill_jit(
                    self.params, jnp.asarray(toks), self.cache,
                    jnp.int32(req.slot), jnp.int32(len(req.prompt)),
                )
            if self.draft_cache is not None:
                self.draft_cache = self._draft_prefill_jit(
                    self.spec.draft_params, jnp.asarray(toks),
                    self.draft_cache, jnp.int32(req.slot),
                    jnp.int32(len(req.prompt)),
                )
        tok = int(sample(logits[None], self._next_key(), self.sampling)[0])
        self._host_lens[req.slot] = len(req.prompt)
        self.metrics.record_prefill(
            len(req.prompt), _time.perf_counter() - t0
        )
        # record the first generated token
        req.generated.append(tok)
        if len(req.generated) >= req.max_tokens or (
            req.eos_token is not None and tok == req.eos_token
        ):
            self.sched.complete(req)
            self.metrics.completed_requests += 1
        else:
            self.next_token[req.slot] = tok

    def _do_prefill_packed(self, reqs):
        """Pack several admitted prompts into one varlen prefill call
        (segment ids + per-sequence positions; ≙ flash_attn_varlen_fwd,
        flash_attn.h:38-66, as the engine's batch-prefill path)."""
        import time as _time

        t0 = _time.perf_counter()
        total = sum(len(r.prompt) for r in reqs)
        bucket = min(bucket_length(total), self.capacity)
        max_b = self.cache.length.shape[0]
        cap = self.capacity

        tokens = np.zeros((1, bucket), np.int32)
        segids = np.zeros((1, bucket), np.int32)
        positions = np.zeros((1, bucket), np.int32)
        slot_map = np.full((bucket,), max_b, np.int32)  # OOB -> dropped
        pos_map = np.full((bucket,), cap, np.int32)     # OOB -> dropped
        ends = np.zeros((max_b,), np.int32)
        slots = np.full((max_b,), max_b, np.int32)      # OOB -> dropped
        lens = np.zeros((max_b,), np.int32)
        off = 0
        for i, r in enumerate(reqs):
            n = len(r.prompt)
            tokens[0, off : off + n] = r.prompt
            segids[0, off : off + n] = i + 1
            positions[0, off : off + n] = np.arange(n)
            slot_map[off : off + n] = r.slot
            pos_map[off : off + n] = np.arange(n)
            ends[i] = off + n
            slots[i] = r.slot
            lens[i] = n
            off += n

        if not hasattr(self, "_packed_jit"):
            self._packed_jit = jax.jit(
                self._prefill_packed_body, donate_argnums=(6,)
            )
        last_logits, self.cache = self._packed_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(segids), jnp.asarray(slot_map), jnp.asarray(pos_map),
            self.cache, jnp.asarray(ends), jnp.asarray(slots),
            jnp.asarray(lens),
        )
        if self.draft_cache is not None:
            # draft admission per request (the draft is small; a packed
            # draft prefill isn't worth a second varlen path)
            for r in reqs:
                db = min(bucket_length(len(r.prompt)), self.capacity)
                dt = np.zeros((1, db), np.int32)
                dt[0, : len(r.prompt)] = r.prompt
                self.draft_cache = self._draft_prefill_jit(
                    self.spec.draft_params, jnp.asarray(dt),
                    self.draft_cache, jnp.int32(r.slot),
                    jnp.int32(len(r.prompt)),
                )
        self.metrics.record_prefill(total, _time.perf_counter() - t0)
        for i, req in enumerate(reqs):
            self._host_lens[req.slot] = len(req.prompt)
        for i, req in enumerate(reqs):
            tok = int(
                sample(last_logits[i][None], self._next_key(), self.sampling)[0]
            )
            req.generated.append(tok)
            if len(req.generated) >= req.max_tokens or (
                req.eos_token is not None and tok == req.eos_token
            ):
                self.sched.complete(req)
                self.metrics.completed_requests += 1
            else:
                self.next_token[req.slot] = tok

    def _prefill_packed_body(self, params, tokens, positions, segids,
                             slot_map, pos_map, cache, ends, slots, lens):
        from flash_attn_tpu.ops.quant import quantize_kv

        logits_all, kvs = self.adapter.prefill_packed(
            params, tokens, positions, segids
        )
        k_buf, v_buf = list(cache.k), list(cache.v)
        ks_buf = None if cache.k_scale is None else list(cache.k_scale)
        vs_buf = None if cache.v_scale is None else list(cache.v_scale)
        for layer, (k, v) in enumerate(kvs):
            kq, ks, vq, vs = quantize_kv(k[0], v[0], cache.mode)
            # scatter packed tokens to (slot, position); padding rows carry
            # out-of-range indices and are dropped
            k_buf[layer] = k_buf[layer].at[slot_map, :, pos_map].set(
                kq.astype(k_buf[layer].dtype), mode="drop"
            )
            v_buf[layer] = v_buf[layer].at[slot_map, :, pos_map].set(
                vq.astype(v_buf[layer].dtype), mode="drop"
            )
            if cache.mode != "none":
                # lane-dense scales: scatter to axis 3 through the store
                # permutation (out-of-range padding lanes still drop)
                lane_map = cache._scale_lane(pos_map)
                ks_buf[layer] = ks_buf[layer].at[slot_map, :, :, lane_map].set(
                    ks, mode="drop"
                )
                vs_buf[layer] = vs_buf[layer].at[slot_map, :, :, lane_map].set(
                    vs, mode="drop"
                )
        length = cache.length.at[slots].set(lens, mode="drop")
        new_cache = KVCache(
            tuple(k_buf), tuple(v_buf),
            None if ks_buf is None else tuple(ks_buf),
            None if vs_buf is None else tuple(vs_buf),
            length, cache.mode, cache.scale_perm_chunk,
        )
        last = logits_all[0, jnp.maximum(ends - 1, 0)]  # [max_b, V]
        return last, new_cache

    def _chunked_prefill(self, req: Request):
        """Feed the prompt through prefill_chunk in bounded pieces, running a
        decode step for the already-active slots between chunks so a long
        prompt never blocks token generation (head-of-line fix).

        Between chunks, unrelated decode steps may append one garbage token
        at this slot's current write position; every chunk (re)writes its
        whole [start, start+C) range, and the final set_length masks the
        tail, so the garbage never survives.
        """
        C = self.prefill_chunk_size
        prompt = req.prompt
        slot = req.slot
        self._prefilling.add(slot)
        pos = 0
        logits = None
        while pos < len(prompt):
            chunk = prompt[pos : pos + C]
            toks = np.zeros((1, C), np.int32)
            toks[0, : len(chunk)] = chunk
            logits_all, self.cache = self._chunk_jit(
                self.params, jnp.asarray(toks), self.cache,
                jnp.int32(slot), jnp.int32(pos),
            )
            logits = logits_all[0, len(chunk) - 1]
            # keep the device length at the chunk frontier so interleaved
            # decode garbage lands inside the region the next chunk rewrites
            self.cache = self.cache.set_length(slot, pos + len(chunk))
            self._host_lens[slot] = pos + len(chunk)
            pos += len(chunk)
            if pos < len(prompt):
                self._do_decode_step()
        self.cache = self.cache.set_length(slot, len(prompt))
        self._host_lens[slot] = len(prompt)
        self._prefilling.discard(slot)
        return logits

    def _do_decode_step(self):
        import time as _time

        t0 = _time.perf_counter()
        # Slots mid-chunked-prefill are in the batch but must not consume
        # decode tokens (their KV/state is incomplete).
        slots = [
            s for s in self.sched.active_slots() if s not in self._prefilling
        ]
        if self._inflight is not None:
            # a speculative burst is already computing on the device:
            # optionally chain the next one off its on-device carry, then
            # sync + consume this one.  Its tokens are valid for every slot
            # whose request is unchanged since dispatch (snapshot guard) —
            # freed/reassigned slots just discard theirs.
            toks_dev, snap = self._inflight
            self._inflight = None
            if self._can_speculate():
                self._speculate(toks_dev)
            self._process_burst(toks_dev, snap, t0)
            return
        if not slots:
            return
        if self.spec is not None and self.sampling.temperature == 0.0:
            # verify appends K+1 KV entries before acceptance is known —
            # fall back to plain decode when any slot lacks the headroom
            # (dynamic_update_slice would clamp and corrupt live context)
            if all(
                int(self._host_lens[s]) + self.spec.num_draft + 1
                <= self.capacity
                for s in slots
            ):
                self._do_spec_decode_step(slots, t0)
                return
        if self.decode_burst > 1 and self._burst_ok(slots):
            toks_dev = self._dispatch_burst(jnp.asarray(self.next_token))
            snap = {s: self.sched.active[s] for s in slots}
            if self._can_speculate():
                # dispatch burst i+1 BEFORE syncing burst i: the burst's
                # own last sampled token is the correct continuation for
                # every slot that stays active, so the device keeps
                # computing while the host reads back + books burst i
                # (overlaps relay RTT + host work under device compute)
                self._speculate(toks_dev)
            self._process_burst(toks_dev, snap, t0)
            return
        if self.lora_bank is not None:
            toks, self.cache = self._decode_lora_jit(
                self.params, jnp.asarray(self.next_token), self.cache,
                self._next_key(), self.lora_bank,
                jnp.asarray(self.adapter_ids),
            )
        else:
            toks, self.cache = self._decode_jit(
                self.params, jnp.asarray(self.next_token), self.cache,
                self._next_key(),
            )
        if self.draft_cache is not None and self.sampling.temperature == 0.0:
            # spec fell back to plain decode this round (some slot lacked
            # K+1 of KV headroom): append the SAME tokens to the draft
            # cache so both caches stay in lockstep — otherwise a later
            # spec round's rollback would claim draft context over
            # positions the draft never wrote (stale KV, acceptance
            # collapse).
            _, self.draft_cache = self._draft_sync_jit(
                self.spec.draft_params, jnp.asarray(self.next_token),
                self.draft_cache,
            )
        self._host_lens += 1  # decode appends for every batch slot
        toks = np.asarray(toks)
        self.metrics.record_decode(len(slots), _time.perf_counter() - t0)
        self._update_kv_metric()
        for slot in slots:
            tok = int(toks[slot])
            if not self.sched.step_done(slot, tok):
                self.next_token[slot] = tok
                continue
            self.metrics.completed_requests += 1

    def _dispatch_burst(self, tokens_dev):
        """Enqueue one burst; the host length mirror advances immediately
        (device semantics: the burst appends for every batch slot)."""
        toks_dev, self.cache = self._burst_jit(
            self.params, tokens_dev, self.cache, self._next_key()
        )
        self._host_lens += self.decode_burst
        return toks_dev

    def _speculate(self, toks_dev):
        snap = {
            s: self.sched.active[s]
            for s in self.sched.active_slots()
            if s not in self._prefilling
        }
        # carry the burst's last sampled tokens on device: no host round
        # trip between bursts
        self._inflight = (self._dispatch_burst(toks_dev[-1]), snap)

    def _can_speculate(self) -> bool:
        """Chain another burst only when it cannot hurt: nothing waiting
        for a slot, no chunked prefill mid-flight, at least one slot still
        has token budget, and one more burst of KV headroom everywhere.
        A burst chained for slots that then complete is discarded tokens +
        masked KV — wasted device time bounded by one burst."""
        if self.decode_burst <= 1 or self.sched.waiting or self._prefilling:
            return False
        slots = self.sched.active_slots()
        if not slots:
            return False
        if not any(
            len(self.sched.active[s].generated) < self.sched.active[s].max_tokens
            for s in slots
        ):
            return False
        return all(
            int(self._host_lens[s]) + self.decode_burst <= self.capacity
            for s in slots
        )

    def _process_burst(self, toks_dev, snap, t0):
        import time as _time

        toks = np.asarray(toks_dev)  # [burst, B] — the sync point
        consumed = 0
        for slot, req in snap.items():
            if self.sched.active.get(slot) is not req:
                continue  # slot reassigned since dispatch: discard tokens
            for i in range(self.decode_burst):
                tok = int(toks[i, slot])
                consumed += 1
                if self.sched.step_done(slot, tok):
                    # EOS/max mid-burst: the slot's tail tokens are
                    # discarded (over-appended KV is masked by length
                    # once the slot is reused)
                    self.metrics.completed_requests += 1
                    break
                self.next_token[slot] = tok
        self.metrics.record_decode(consumed, _time.perf_counter() - t0)
        self._update_kv_metric()

    def _update_kv_metric(self):
        self.metrics.kv_tokens_in_use = int(
            sum(self._host_lens[s] for s in self.sched.active_slots())
        )

    def _burst_ok(self, slots) -> bool:
        """Burst only when it can't hurt latency or correctness: no
        waiting requests (admission isn't delayed), no mid-chunked-prefill
        slots, and one burst of KV headroom on every active slot.  A slot
        whose budget runs out mid-burst simply discards its tail tokens
        (step_done stops consuming at max_tokens) — bursting PAST the
        budget is what keeps the request tail off the expensive one-
        dispatch-per-token path."""
        if self.sched.waiting or self._prefilling:
            return False
        return all(
            int(self._host_lens[s]) + self.decode_burst <= self.capacity
            for s in slots
        )

    def _do_spec_decode_step(self, slots, t0):
        """One speculative decode round: draft K tokens per slot on the
        host, verify [current, drafts] in ONE decode_multi sweep, emit the
        accepted prefix + the model's correction token (greedy-exact)."""
        import time as _time

        K = self.spec.num_draft
        max_b = self.next_token.shape[0]
        tok_in = np.zeros((max_b, K + 1), np.int32)
        tok_in[:, 0] = self.next_token
        if self.draft_cache is not None:
            drafts_dev, self.draft_cache = self._draft_scan_jit(
                self.spec.draft_params, jnp.asarray(self.next_token),
                self.draft_cache,
            )
            drafts = np.asarray(drafts_dev)  # [B, K]
        else:
            drafts = np.zeros((max_b, K), np.int32)
            for s in slots:
                req = self.sched.active[s]
                drafts[s] = _ngram_draft(
                    req.prompt + req.generated, self.spec.ngram, K
                )
        tok_in[:, 1:] = drafts
        lens_before = self._host_lens.copy()

        if not hasattr(self, "_verify_jit"):
            self._verify_jit = jax.jit(
                self.adapter.decode_multi, donate_argnums=(2,)
            )
        logits, self.cache = self._verify_jit(
            self.params, jnp.asarray(tok_in), self.cache
        )
        self._host_lens += K + 1
        greedy = np.asarray(jnp.argmax(logits, axis=-1))  # [B, K+1]
        self.metrics.record_decode(len(slots), _time.perf_counter() - t0)
        self._update_kv_metric()

        # decode_multi advanced every slot by K+1; active slots roll back
        # to their true consumed context below (the over-appended KV is
        # overwritten by the next append, the chunked-prefill trick).
        new_len = self._host_lens.copy()
        for s in slots:
            n_acc = 0
            while n_acc < K and drafts[s, n_acc] == greedy[s, n_acc]:
                n_acc += 1
            emitted = [int(t) for t in drafts[s, :n_acc]]
            emitted.append(int(greedy[s, n_acc]))
            self.metrics.record_spec(len(emitted), K)
            done = False
            for tok in emitted:
                if self.sched.step_done(s, tok):
                    done = True
                    self.metrics.completed_requests += 1
                    break
            # cache holds context for everything but the newest token
            new_len[s] = lens_before[s] + n_acc + 1
            if not done:
                self.next_token[s] = emitted[-1]
        self.cache = KVCache(
            self.cache.k, self.cache.v, self.cache.k_scale,
            self.cache.v_scale, jnp.asarray(new_len), self.cache.mode,
            self.cache.scale_perm_chunk,
        )
        if self.draft_cache is not None:
            # the draft scan appended the same K+1 entries the verify
            # appended to the target cache: identical length rollback
            dc = self.draft_cache
            self.draft_cache = KVCache(
                dc.k, dc.v, dc.k_scale, dc.v_scale, jnp.asarray(new_len),
                dc.mode, dc.scale_perm_chunk,
            )
        self._host_lens = new_len.copy()

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def _insert_slot_kv(cache: KVCache, layer: int, slot, k, v) -> KVCache:
    """Write a full prompt's KV [S, Hk, D] into (layer, slot) of the
    BHSD-layout cache."""
    from flash_attn_tpu.ops.quant import quantize_kv

    from flash_attn_tpu.engine.kv_cache import _tset

    kq, ks, vq, vs = quantize_kv(k, v, cache.mode)

    def put(buf, new):
        # new [S, Hk, c] -> [Hk, S, c]; buf [B, Hk, S, c]
        new = jnp.swapaxes(new, 0, 1)
        return jax.lax.dynamic_update_slice(
            buf, new[None].astype(buf.dtype), (slot, 0, 0, 0)
        )

    knew = _tset(cache.k, layer, put(cache.k[layer], kq))
    vnew = _tset(cache.v, layer, put(cache.v[layer], vq))
    ksn, vsn = cache.k_scale, cache.v_scale
    if cache.mode != "none":
        # lane-dense scales: [S, Hk, 1] lands on (permuted) lanes 0..S-1
        lanes = cache._scale_lane(jnp.arange(ks.shape[0]))
        ksn = _tset(
            cache.k_scale, layer,
            cache.k_scale[layer].at[slot, :, :, lanes].set(ks),
        )
        vsn = _tset(
            cache.v_scale, layer,
            cache.v_scale[layer].at[slot, :, :, lanes].set(vs),
        )
    return KVCache(knew, vnew, ksn, vsn, cache.length, cache.mode,
                   cache.scale_perm_chunk)


class PagedInferenceEngine:
    """Continuous batching over a paged KV pool with the NATIVE page
    allocator (runtime/native/page_allocator.cc) gating admission.

    Differences vs InferenceEngine: KV lives in PagedKVPool pages sized to
    the decode kernel's tile; the host-side allocator (C, O(1) acquire,
    O(pages) release) decides admission — a request is admitted only when
    enough pages exist for prompt + max_tokens, and its pages return to the
    free list at completion (the vLLM-style admission/eviction loop the
    round-1 engine never exercised).
    """

    def __init__(
        self,
        params,
        adapter: ModelAdapter,
        *,
        max_batch: int = 8,
        capacity: int = 2048,
        page_size: int = 128,
        num_pages: int | None = None,
        kv_mode: str = "none",
        cache_dtype=jnp.bfloat16,
        sampling: SamplingParams | None = None,
        rng_seed: int = 0,
        prefix_cache: bool = False,
        decode_burst: int = 1,
    ):
        from flash_attn_tpu.engine.paged import PagedKVPool
        from flash_attn_tpu.runtime.abi import PagePool

        if adapter.decode_step_paged is None:
            raise ValueError("adapter has no decode_step_paged")
        if prefix_cache and adapter.prefill_suffix_paged is None:
            raise ValueError("prefix_cache needs adapter.prefill_suffix_paged")
        self.params = params
        self.adapter = adapter
        self.page_size = page_size
        self.max_pages = -(-capacity // page_size)
        # +1 for the reserved null page 0
        num_pages = num_pages or (max_batch * self.max_pages + 1)
        self.alloc = PagePool(num_pages)
        self.pool = PagedKVPool.create(
            adapter.num_layers, num_pages, page_size, max_batch,
            self.max_pages, adapter.num_kv_heads, adapter.head_dim,
            dtype=cache_dtype, mode=kv_mode,
        )
        self.sampling = sampling or SamplingParams()
        self.sched = ContinuousBatchingScheduler(max_batch)
        self.key = jax.random.PRNGKey(rng_seed)
        self.next_token = np.zeros((max_batch,), np.int32)
        # host mirrors (no device readbacks on the hot path): per-slot
        # length, and per-slot allocated token capacity (pages * page_size)
        self._host_lens = np.zeros((max_batch,), np.int32)
        self._slot_cap = np.zeros((max_batch,), np.int64)
        self._inflight = None
        from flash_attn_tpu.utils.metrics import EngineMetrics

        self.metrics = EngineMetrics(kv_capacity=(num_pages - 1) * page_size)
        self._pending_pages: dict[int, list[int]] = {}
        self._decode_jit = jax.jit(self._decode_batch, donate_argnums=(2,))
        self._prefill_jit = jax.jit(self._prefill_one, donate_argnums=(2,))
        # multi-step scheduling, same contract as InferenceEngine's
        # decode_burst: admission acquires pages for prompt + max_tokens
        # rounded up to a whole final burst, so every burst (including the
        # request's tail, which may overshoot max_tokens and discard) stays
        # inside the slot's own pages.
        self.decode_burst = max(1, int(decode_burst))
        if self.decode_burst > 1:
            self._burst_jit = jax.jit(
                self._decode_burst_body, donate_argnums=(2,)
            )
        # prefix caching (engine/prefix_cache.py): shared prompt prefixes
        # reuse resident pages; cache-owned pages live under the pseudo-slot
        # ``max_batch`` so request releases never free them.
        self.prefix = None
        if prefix_cache:
            from flash_attn_tpu.engine.prefix_cache import PrefixCache

            self.prefix = PrefixCache(page_size)
            self.cache_slot = max_batch
            self._pending_prefix: dict[int, tuple] = {}
            self._slot_prefix: dict[int, tuple] = {}
            self._slot_pages: dict[int, list[int]] = {}
            self._slot_refs: dict[int, tuple] = {}
            self._prefill_suffix_jit = jax.jit(
                self._prefill_suffix, donate_argnums=(2,)
            )

    def _pages_needed(self, req: Request) -> int:
        total = len(req.prompt) + req.max_tokens
        if self.decode_burst > 1:
            # round the decode budget up to whole bursts: the tail burst
            # overshoots max_tokens (tokens discarded) but must still land
            # inside the slot's own pages
            gen = -(-req.max_tokens // self.decode_burst) * self.decode_burst
            total = len(req.prompt) + gen
        return -(-total // self.page_size)

    # --- jitted bodies ---

    def _prefill_one(self, params, tokens, pool, slot, true_len):
        positions = jnp.arange(tokens.shape[1])[None]
        logits_all, kvs = self.adapter.prefill_with_kv(params, tokens, positions)
        for layer, (k, v) in enumerate(kvs):
            pool = pool.append_prefill(layer, slot, k[0], v[0], 0)
        pool = pool.set_lengths(pool.length.at[slot].set(true_len))
        return logits_all[0, true_len - 1], pool

    def _prefill_suffix(self, params, tokens, pool, slot, start, total_len):
        """Prefix-cache path: prefill only the suffix [start, total_len)
        against the slot's resident prefix pages."""
        logits_all, pool = self.adapter.prefill_suffix_paged(
            params, tokens, pool, slot, start
        )
        pool = pool.set_lengths(pool.length.at[slot].set(total_len))
        return logits_all[0, total_len - start - 1], pool

    def _decode_batch(self, params, tokens, pool, key):
        logits, pool = self.adapter.decode_step_paged(params, tokens, pool)
        toks = sample(logits, key, self.sampling)
        return toks, pool

    def _decode_burst_body(self, params, tokens, pool, key):
        keys = jax.random.split(key, self.decode_burst)

        def step(carry, k):
            tok, pl_ = carry
            logits, pl_ = self.adapter.decode_step_paged(params, tok, pl_)
            tok = sample(logits, k, self.sampling)
            return (tok, pl_), tok

        (_, pool), toks = jax.lax.scan(step, (tokens, pool), keys)
        return toks, pool

    # --- host loop ---

    def submit(self, prompt, max_tokens=64) -> Request:
        return self.sched.submit(prompt, max_tokens, self.adapter.eos_token)

    def cancel(self, req: Request) -> bool:
        """See InferenceEngine.cancel."""
        return self.sched.cancel(req)

    def run(self, max_steps: int = 10_000) -> None:
        steps = 0
        while self.sched.has_work and steps < max_steps:
            steps += 1
            if self._inflight is not None and not self.sched.active:
                self._inflight = None  # all its requests are gone
            for req in self.sched.admit(self._can_admit):
                self._admit_pages(req)
                self._do_prefill(req)
            if not self.sched.active and self._inflight is None:
                continue
            self._do_decode_step()

    def _can_admit(self, req: Request) -> bool:
        """Resource-gated admission: acquire the pages NOW (against the slot
        the scheduler will assign — it pops free_slots[0]) so admission of a
        second request in the same round sees the reduced free list.  With
        the prefix cache on, cached prefix pages are reused (ref'd here so a
        same-round eviction can't free them) and only the remainder is
        acquired; unreferenced cache entries are evicted LRU if the free
        list falls short."""
        if not self.sched.free_slots:
            return False
        slot = self.sched.free_slots[0]
        cached_pages, cached_len = [], 0
        if self.prefix is not None:
            cached_pages, cached_len = self.prefix.lookup(req.prompt)
            self.prefix.ref(req.prompt, len(cached_pages))
        need = self._pages_needed(req) - len(cached_pages)
        pages = self.alloc.acquire(slot, need)
        if pages is None and self.prefix is not None:
            self.prefix.evict(need - self.alloc.free_count, self.alloc)
            pages = self.alloc.acquire(slot, need)
        if pages is None:
            if self.prefix is not None:
                self.prefix.unref(req.prompt, len(cached_pages))
            return False
        self._pending_pages[req.uid] = cached_pages + pages
        if self.prefix is not None:
            self._pending_prefix[req.uid] = (len(cached_pages), cached_len)
        return True

    def _admit_pages(self, req: Request):
        pages = self._pending_pages.pop(req.uid)
        self.pool = self.pool.assign_pages(req.slot, pages)
        self._slot_cap[req.slot] = len(pages) * self.page_size
        if self.prefix is not None:
            self._slot_prefix[req.slot] = self._pending_prefix.pop(req.uid)
            self._slot_pages[req.slot] = pages

    def _release(self, req_slot: int):
        if self.prefix is not None:
            n_ref, prompt = self._slot_refs.pop(req_slot, (0, ()))
            self.prefix.unref(prompt, n_ref)
            self._slot_prefix.pop(req_slot, None)
            self._slot_pages.pop(req_slot, None)
        self.alloc.release_slot(req_slot)
        # zero the table row so blanket decode appends for this (now
        # inactive) slot land on the null page, never on reacquired pages
        self.pool = self.pool.assign_pages(
            req_slot, [0] * self.pool.max_pages
        )
        self.pool = self.pool.set_lengths(
            self.pool.length.at[req_slot].set(0)
        )
        self._host_lens[req_slot] = 0
        self._slot_cap[req_slot] = 0

    def _do_prefill(self, req: Request):
        import time as _time

        t0 = _time.perf_counter()
        n_cached, cached_len = (
            self._slot_prefix.get(req.slot, (0, 0))
            if self.prefix is not None else (0, 0)
        )
        if cached_len > 0:
            # prefix-cache hit: prefill only the divergent suffix
            suffix = req.prompt[cached_len:]
            bucket = bucket_length(len(suffix))
            bucket = min(bucket, self.max_pages * self.page_size - cached_len)
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(suffix)] = suffix
            logits, self.pool = self._prefill_suffix_jit(
                self.params, jnp.asarray(toks), self.pool,
                jnp.int32(req.slot), jnp.int32(cached_len),
                jnp.int32(len(req.prompt)),
            )
            self.metrics.record_prefill(
                len(suffix), _time.perf_counter() - t0
            )
        else:
            bucket = bucket_length(len(req.prompt))
            bucket = min(bucket, self.max_pages * self.page_size)
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(req.prompt)] = req.prompt
            logits, self.pool = self._prefill_jit(
                self.params, jnp.asarray(toks), self.pool,
                jnp.int32(req.slot), jnp.int32(len(req.prompt)),
            )
            self.metrics.record_prefill(
                len(req.prompt), _time.perf_counter() - t0
            )
        if self.prefix is not None:
            # donate this prompt's full pages to the cache and hold one
            # net reference per full-prefix entry for the request's lifetime
            full = max(0, (len(req.prompt) - 1) // self.page_size)
            self.prefix.insert(
                req.prompt, self._slot_pages[req.slot][:full],
                self.alloc, self.cache_slot,
            )
            self.prefix.ref(req.prompt, full)
            self.prefix.unref(req.prompt, n_cached)
            self._slot_refs[req.slot] = (full, tuple(req.prompt))
        tok = int(sample(logits[None], self._next_key(), self.sampling)[0])
        self._host_lens[req.slot] = len(req.prompt)
        req.generated.append(tok)
        if len(req.generated) >= req.max_tokens or (
            req.eos_token is not None and tok == req.eos_token
        ):
            slot = req.slot
            self.sched.complete(req)
            self._release(slot)
            self.metrics.completed_requests += 1
        else:
            self.next_token[req.slot] = tok

    def _do_decode_step(self):
        import time as _time

        t0 = _time.perf_counter()
        slots = self.sched.active_slots()
        if self._inflight is not None:
            toks_dev, snap = self._inflight
            self._inflight = None
            if self._can_speculate():
                self._speculate(toks_dev)
            self._process_burst(toks_dev, snap, t0)
            return
        if not slots:
            return
        if self.decode_burst > 1 and self._burst_ok(slots):
            toks_dev = self._dispatch_burst(jnp.asarray(self.next_token))
            snap = {s: self.sched.active[s] for s in slots}
            if self._can_speculate():
                self._speculate(toks_dev)
            self._process_burst(toks_dev, snap, t0)
            return
        toks, self.pool = self._decode_jit(
            self.params, jnp.asarray(self.next_token), self.pool,
            self._next_key(),
        )
        self._host_lens += 1
        toks = np.asarray(toks)
        self.metrics.record_decode(len(slots), _time.perf_counter() - t0)
        self._update_kv_metric()
        for slot in slots:
            tok = int(toks[slot])
            if not self.sched.step_done(slot, tok):
                self.next_token[slot] = tok
            else:
                self._release(slot)
                self.metrics.completed_requests += 1

    def _dispatch_burst(self, tokens_dev):
        toks_dev, self.pool = self._burst_jit(
            self.params, tokens_dev, self.pool, self._next_key()
        )
        self._host_lens += self.decode_burst
        return toks_dev

    def _speculate(self, toks_dev):
        snap = dict(self.sched.active)
        self._inflight = (self._dispatch_burst(toks_dev[-1]), snap)

    def _can_speculate(self) -> bool:
        """Pipeline a second burst off the device-resident carry — only
        when nothing is waiting for a slot, some slot still has budget,
        and every active slot's pages cover one more burst."""
        if self.decode_burst <= 1 or self.sched.waiting:
            return False
        slots = self.sched.active_slots()
        if not slots:
            return False
        if not any(
            len(self.sched.active[s].generated) < self.sched.active[s].max_tokens
            for s in slots
        ):
            return False
        return all(
            int(self._host_lens[s]) + self.decode_burst <= int(self._slot_cap[s])
            for s in slots
        )

    def _process_burst(self, toks_dev, snap, t0):
        import time as _time

        toks = np.asarray(toks_dev)  # [burst, B]
        consumed = 0
        for slot, req in snap.items():
            if self.sched.active.get(slot) is not req:
                continue
            for i in range(self.decode_burst):
                tok = int(toks[i, slot])
                consumed += 1
                if self.sched.step_done(slot, tok):
                    self._release(slot)
                    self.metrics.completed_requests += 1
                    break
                self.next_token[slot] = tok
        self.metrics.record_decode(consumed, _time.perf_counter() - t0)
        self._update_kv_metric()

    def _update_kv_metric(self):
        self.metrics.kv_tokens_in_use = int(
            sum(self._host_lens[s] for s in self.sched.active_slots())
        )

    def _burst_ok(self, slots) -> bool:
        """Burst whenever nothing is waiting and every active slot's
        allocated pages cover one more burst; a slot whose budget runs out
        mid-burst discards its tail (see _pages_needed for why the pages
        always cover the tail burst)."""
        if self.sched.waiting:
            return False
        return all(
            int(self._host_lens[s]) + self.decode_burst <= int(self._slot_cap[s])
            for s in slots
        )

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub
