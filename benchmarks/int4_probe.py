"""INT4 weight-quality attribution probes (r4 item 2), merged.

Three parts, selected by --part (default: all that fit the backend):

  small  — CPU, tiny random-init llama: decompose the int4 ppl delta by
           weight group (head vs blocks), int8 comparison, group-size sweep.
  bench  — real chip, 8B dims: matmul_int4 kernel vs dequant oracle per
           projection shape + teacher-forced NLL ladder at bench dims.
  greedy — real chip, 8B dims: the harness-artifact test — scoring the
           float model's OWN greedy continuation at random init is
           max-sensitivity (~1 nat apparent delta); the same quantized
           weights scoring random tokens cost < 0.02 nat.

Conclusions (recorded in docs/ROADMAP.md "Round 4" and BENCHMARKS.md):
the r3 ~1-nat int4 ladder delta was harness scoring sensitivity, not
scheme damage; the scheme gained per-group MSE clip search anyway.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from flash_attn_tpu.models import llama
from flash_attn_tpu.ops.matmul import quantized_matmul
from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4


def _nll_fn(cfg, toks, interpret=False):
    T = toks.shape[1] - 1
    pos = jnp.arange(T)[None]

    def nll(p):
        logits, _ = llama.prefill_with_kv(
            p, toks[:, :T], pos, cfg, interpret=interpret
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = toks[0, 1 : T + 1]
        return float(-jnp.mean(logp[0, jnp.arange(T), tgt]))

    return nll


def part_small():
    cfg = llama.LlamaConfig(
        vocab_size=4096, hidden=512, intermediate=1536,
        num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=64, max_position=512, rope_theta=10000.0,
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (1, 257), 0, cfg.vocab_size
    )
    nll = _nll_fn(cfg, toks, interpret=True)
    base = nll(params)
    print(f"float NLL: {base:.5f}", flush=True)
    for name, skip in [
        ("int4 all-but-tok_emb (ladder today)", ("tok_emb",)),
        ("int4 blocks only (head stays float)", ("tok_emb", "lm_head")),
    ]:
        q = llama.quantize_weights(params, mode="int4", skip=skip)
        print(f"{name}: delta={nll(q)-base:+.5f}", flush=True)
    q8 = llama.quantize_weights(params, mode="int8", skip=("tok_emb",))
    print(f"int8 all-but-tok_emb: delta={nll(q8)-base:+.5f}", flush=True)
    q = llama.quantize_weights(
        params, mode="int4", skip=("tok_emb", "lm_head")
    )
    q8h = llama.quantize_weights(params, mode="int8", skip=("tok_emb",))
    q["lm_head"] = q8h["lm_head"]
    print(f"int4 blocks + int8 head: delta={nll(q)-base:+.5f}", flush=True)
    for g in (128, 64, 32):
        q = llama.quantize_weights(
            params, mode="int4", group_size=g, skip=("tok_emb", "lm_head")
        )
        print(f"int4 blocks g={g}: delta={nll(q)-base:+.5f}", flush=True)


def _bench_cfg():
    return llama.LlamaConfig(
        vocab_size=32768, hidden=4096, intermediate=14336,
        num_layers=2, num_heads=32, num_kv_heads=8,
        head_dim=128, max_position=512, rope_theta=500000.0,
        dtype="bfloat16",
    )


def part_bench():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # (a) kernel vs dequant oracle at decode/prefill shapes, incl. the
    #     unrolled g<128 Mosaic path
    for M, K, N, g, tag in [
        (8, 4096, 14336, 128, "decode w_up"),
        (8, 14336, 4096, 128, "decode w_down"),
        (8, 4096, 4096, 128, "decode wq/wo"),
        (256, 4096, 14336, 128, "prefill w_up"),
        (8, 4096, 4096, 64, "decode wq/wo g=64 (unrolled)"),
        (8, 4096, 4096, 32, "decode wq/wo g=32 (unrolled)"),
    ]:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        w4 = quantize_int4(w, group_size=g)
        got = quantized_matmul(x, w4, out_dtype=jnp.float32)
        want = jnp.dot(x.astype(jnp.float32), dequantize_int4(w4, jnp.float32))
        ref = jnp.dot(x.astype(jnp.float32), w)
        kerr = float(jnp.abs(got - want).max() / jnp.abs(want).std())
        qerr = float(jnp.abs(want - ref).std() / ref.std())
        print(
            f"{tag}: kernel-vs-dequant rel {kerr:.5f}; "
            f"quant-vs-float rel {qerr:.5f}", flush=True,
        )
        assert kerr < 1e-3, (tag, kerr)
    # (b) NLL ladder at bench dims via prefill path
    cfg = _bench_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (1, 129), 0, cfg.vocab_size
    )
    nll = _nll_fn(cfg, toks)
    base = nll(params)
    print(f"float NLL: {base:.5f}", flush=True)
    for name, mode, skip in [
        ("int8 all-but-tok_emb", "int8", ("tok_emb",)),
        ("int4 all-but-tok_emb (ladder)", "int4", ("tok_emb",)),
        ("int4 blocks only", "int4", ("tok_emb", "lm_head")),
    ]:
        q = llama.quantize_weights(params, mode=mode, skip=skip)
        print(f"{name}: delta={nll(q)-base:+.5f}", flush=True)
    for g in (64, 32):
        q = llama.quantize_weights(
            params, mode="int4", group_size=g, skip=("tok_emb", "lm_head")
        )
        print(f"int4 blocks g={g}: delta={nll(q)-base:+.5f}", flush=True)


def part_greedy():
    print("devices:", jax.devices(), flush=True)
    cfg = _bench_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.asarray([[1, 17, 33, 200, 4, 99, 1234, 7]], jnp.int32)

    def greedy_continue(p, toks, n):
        # fixed padded shape -> ONE compile for all n iterations (the
        # remote compiler pays per shape)
        total = toks.shape[1] + n
        seq = jnp.zeros((1, total), jnp.int32).at[:, : toks.shape[1]].set(toks)

        @jax.jit
        def step(seq, cur_len):
            pos = jnp.arange(total)[None]
            logits, _ = llama.prefill_with_kv(p, seq, pos, cfg)
            nxt = jnp.argmax(logits[0, cur_len - 1]).astype(jnp.int32)
            return seq.at[0, cur_len].set(nxt)

        for i in range(n):
            seq = step(seq, jnp.int32(toks.shape[1] + i))
        return seq

    seq = greedy_continue(params, prompt, 48)
    print("continuation generated:", seq.shape, flush=True)

    def nll_on(p, s):
        return _nll_fn(cfg, s)(p)

    base = nll_on(params, seq)
    print(f"float NLL on own greedy continuation: {base:.5f}", flush=True)
    for name, mode, kw in [
        ("int8", "int8", {}),
        ("int4 (clip_search)", "int4", {}),
        ("int4 g=64", "int4", {"group_size": 64}),
    ]:
        q = llama.quantize_weights(params, mode=mode, skip=("tok_emb",), **kw)
        print(f"{name}: greedy-cont delta={nll_on(q, seq)-base:+.5f}",
              flush=True)
    rand = jax.random.randint(
        jax.random.PRNGKey(5), (1, 57), 0, cfg.vocab_size
    )
    base_r = nll_on(params, rand)
    q4 = llama.quantize_weights(params, mode="int4", skip=("tok_emb",))
    print(f"int4 random-token delta={nll_on(q4, rand)-base_r:+.5f}",
          flush=True)


PARTS = {"small": part_small, "bench": part_bench, "greedy": part_greedy}


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--part", choices=sorted(PARTS), action="append",
                    help="which probe(s) to run (default: small on CPU, "
                    "all three on TPU)")
    args = ap.parse_args()
    parts = args.part
    if not parts:
        on_tpu = jax.default_backend() not in ("cpu",)
        parts = ["small", "bench", "greedy"] if on_tpu else ["small"]
    for p in parts:
        print(f"=== part: {p} ===", flush=True)
        PARTS[p]()
