"""r4 item 2: decompose the int4 ppl delta — which weights cost what, and
how much do scheme improvements (MSE clip, group size, zero-point, full
range) recover.  CPU, small random-init llama, teacher-forced NLL via the
prefill path (same math as the ladder, minus the engine loop)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from flash_attn_tpu.models import llama

cfg = llama.LlamaConfig(
    vocab_size=4096, hidden=512, intermediate=1536,
    num_layers=2, num_heads=8, num_kv_heads=4,
    head_dim=64, max_position=512, rope_theta=10000.0,
    dtype="float32",
)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
T = 256
toks = jax.random.randint(jax.random.PRNGKey(1), (1, T + 1), 0, cfg.vocab_size)
pos = jnp.arange(T)[None]


def nll(p):
    logits, _ = llama.prefill_with_kv(p, toks[:, :T], pos, cfg, interpret=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = toks[0, 1 : T + 1]
    return float(-jnp.mean(logp[0, jnp.arange(T), tgt]))


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

# int4 blocks + int8 head
q = llama.quantize_weights(params, mode="int4", skip=("tok_emb", "lm_head"))
q8h = llama.quantize_weights(params, mode="int8", skip=("tok_emb",))
q["lm_head"] = q8h["lm_head"]
print(f"int4 blocks + int8 head: delta={nll(q)-base:+.5f}", flush=True)

# group-size sweep, blocks-only
for g in (128, 64, 32):
    q = llama.quantize_weights(
        params, mode="int4", group_size=g, skip=("tok_emb", "lm_head")
    )
    print(f"int4 blocks g={g}: delta={nll(q)-base:+.5f}", flush=True)
