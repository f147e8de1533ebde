"""r4 item 2 (part 2): at the BENCH dims (8B layers), on the real chip —
(a) matmul_int4 kernel vs dequantize-then-float oracle per projection shape,
(b) teacher-forced NLL delta via the prefill path, int4 blocks-only vs
all-but-tok_emb, vs int8.  Separates kernel numerics from scheme damage."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from flash_attn_tpu.models import llama
from flash_attn_tpu.ops.matmul import quantized_matmul
from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

print("devices:", jax.devices(), flush=True)

# (a) kernel vs dequant oracle at decode/prefill shapes
rng = np.random.default_rng(0)
for M, K, N, tag in [
    (8, 4096, 14336, "decode w_up"),
    (8, 14336, 4096, "decode w_down"),
    (8, 4096, 4096, "decode wq/wo"),
    (256, 4096, 14336, "prefill w_up"),
]:
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    w4 = quantize_int4(w, group_size=128)
    got = quantized_matmul(x, w4, out_dtype=jnp.float32)
    want = jnp.dot(
        x.astype(jnp.float32), dequantize_int4(w4, jnp.float32)
    )
    ref = jnp.dot(x.astype(jnp.float32), w)
    kerr = float(jnp.abs(got - want).max() / jnp.abs(want).std())
    qerr = float(jnp.abs(want - ref).std() / ref.std())
    print(f"{tag}: kernel-vs-dequant rel {kerr:.5f}; quant-vs-float rel {qerr:.5f}",
          flush=True)

# (b) NLL ladder at bench dims via prefill path
cfg = llama.LlamaConfig(
    vocab_size=32768, hidden=4096, intermediate=14336,
    num_layers=2, num_heads=32, num_kv_heads=8,
    head_dim=128, max_position=512, rope_theta=500000.0,
    dtype="bfloat16",
)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
T = 128
toks = jax.random.randint(jax.random.PRNGKey(1), (1, T + 1), 0, cfg.vocab_size)
pos = jnp.arange(T)[None]


def nll(p):
    logits, _ = llama.prefill_with_kv(p, toks[:, :T], pos, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = toks[0, 1 : T + 1]
    return float(-jnp.mean(logp[0, jnp.arange(T), tgt]))


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
    try:
        q = llama.quantize_weights(
            params, mode="int4", group_size=g, skip=("tok_emb", "lm_head")
        )
        print(f"int4 blocks g={g}: delta={nll(q)-base:+.5f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int4 blocks g={g}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
