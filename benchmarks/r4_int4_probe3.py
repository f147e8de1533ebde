"""r4 item 2 (part 3): (a) validate the unrolled g<128 matmul_int4 path on
real Mosaic; (b) test the harness-artifact hypothesis — the ladder's ~1-nat
int4 delta comes from scoring the float model's OWN greedy continuation at
random init (max-sensitivity tokens), not from scheme damage: the same
weights scoring random tokens cost ~0 nats (r4_int4_probe2)."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from flash_attn_tpu.models import llama
from flash_attn_tpu.ops.matmul import quantized_matmul
from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

print("devices:", jax.devices(), flush=True)

# (a) g=64 unrolled kernel on real Mosaic
rng = np.random.default_rng(0)
for g in (64, 32):
    x = jnp.asarray(rng.standard_normal((8, 4096)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32)
    w4 = quantize_int4(w, group_size=g)
    got = quantized_matmul(x, w4, out_dtype=jnp.float32)
    want = jnp.dot(x.astype(jnp.float32), dequantize_int4(w4, jnp.float32))
    err = float(jnp.abs(got - want).max() / jnp.abs(want).std())
    print(f"matmul_int4 g={g} on Mosaic: rel err vs dequant {err:.6f}",
          flush=True)
    assert err < 1e-3, err

# (b) greedy-continuation scoring at bench dims
cfg = llama.LlamaConfig(
    vocab_size=32768, hidden=4096, intermediate=14336,
    num_layers=2, num_heads=32, num_kv_heads=8,
    head_dim=128, max_position=512, rope_theta=500000.0,
    dtype="bfloat16",
)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
T = 128

# float model greedy continuation from a short prompt
prompt = jnp.asarray([[1, 17, 33, 200, 4, 99, 1234, 7]], jnp.int32)


def greedy_continue(p, toks, n):
    # fixed padded shape -> ONE compile for all n iterations (the remote
    # compiler pays per shape)
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


def nll_on(p, seq):
    Tm = seq.shape[1] - 1
    pos = jnp.arange(Tm)[None]
    logits, _ = llama.prefill_with_kv(p, seq[:, :Tm], pos, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = seq[0, 1 : Tm + 1]
    return float(-jnp.mean(logp[0, jnp.arange(Tm), tgt]))


base = nll_on(params, seq)
print(f"float NLL on own greedy continuation: {base:.5f}", flush=True)
for name, mode, kw in [
    ("int8", "int8", {}),
    ("int4 (clip_search)", "int4", {}),
    ("int4 g=64", "int4", {"group_size": 64}),
]:
    q = llama.quantize_weights(params, mode=mode, skip=("tok_emb",), **kw)
    print(f"{name}: greedy-cont delta={nll_on(q, seq)-base:+.5f}", flush=True)

# same weights, random-token scoring (the probe2 result, for side-by-side)
rand = jax.random.randint(jax.random.PRNGKey(5), (1, 57), 0, cfg.vocab_size)
base_r = nll_on(params, rand)
q4 = llama.quantize_weights(params, mode="int4", skip=("tok_emb",))
print(f"int4 random-token delta={nll_on(q4, rand)-base_r:+.5f}", flush=True)
