"""HF weight-conversion validation + perplexity-delta harness (SURVEY.md
§4.2/§4.4; round-1 Missing #1/#2).

Public checkpoints are unreachable in this zero-egress image, so the
conversion path is validated against torch models BUILT FROM CONFIG with
random init — that exercises the real risk (weight orientation / layout /
naming conventions), token-exactly, without the network.  ``load_hf`` is the
same conversion applied to a downloaded checkpoint.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attn_tpu.models import gpt2 as g2
from flash_attn_tpu.models import llama as ll


@pytest.fixture(scope="module")
def torch_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=512, n_positions=128, n_embd=128, n_layer=2, n_head=4
    )
    model = GPT2LMHeadModel(cfg).eval()
    return model


def test_gpt2_conversion_logits_match(torch_gpt2):
    sd = {k: v.detach().numpy() for k, v in torch_gpt2.state_dict().items()}
    params, cfg = g2.convert_hf_state_dict(sd, dtype="float32", num_heads=4)
    assert cfg.num_layers == 2 and cfg.hidden == 128 and cfg.num_heads == 4

    tokens = np.random.RandomState(1).randint(0, 512, size=(2, 24))
    with torch.no_grad():
        want = torch_gpt2(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(g2.forward(params, jnp.asarray(tokens), cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_gpt2_greedy_tokens_match_hf(torch_gpt2):
    """Greedy decode through our engine-path (prefill + flash-decode cache)
    must be token-exact vs HF greedy generate."""
    sd = {k: v.detach().numpy() for k, v in torch_gpt2.state_dict().items()}
    params, cfg = g2.convert_hf_state_dict(sd, dtype="float32", num_heads=4)

    prompt = np.random.RandomState(2).randint(0, 512, size=(1, 12))
    steps = 8
    with torch.no_grad():
        hf_out = torch_gpt2.generate(
            torch.tensor(prompt), max_new_tokens=steps, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1]:]
    ours = np.asarray(
        g2.greedy_decode(params, jnp.asarray(prompt), cfg, steps=steps,
                         interpret=True)
    )[0]
    np.testing.assert_array_equal(ours, hf_out)


def test_llama_conversion_logits_match():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    params, cfg = ll.convert_hf_model(model, dtype="float32")
    assert cfg.num_kv_heads == 2 and cfg.head_dim == 16

    tokens = np.random.RandomState(4).randint(0, 256, size=(1, 16))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(ll.forward(params, jnp.asarray(tokens), cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)


def test_kv_ppl_delta_harness(torch_gpt2):
    """Quantized-KV perplexity deltas are bounded (BASELINE 'perplexity Δ
    bounded at same KV bit-width'): int8/fp8 KV must not blow up NLL."""
    from flash_attn_tpu.utils.ppl import kv_ppl_delta

    sd = {k: v.detach().numpy() for k, v in torch_gpt2.state_dict().items()}
    params, cfg = g2.convert_hf_state_dict(sd, dtype="float32", num_heads=4)
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 512, size=16)
    cont = rng.randint(0, 512, size=12)
    res = kv_ppl_delta(params, cfg, prompt, cont, modes=("int8", "fp8"),
                       interpret=True)
    base = res["none"]["ppl"]
    for mode in ("int8", "fp8"):
        rel = abs(res[mode]["delta_ppl"]) / base
        assert rel < 0.05, (mode, res)


def test_weight_quant_ppl_delta():
    """INT8/INT4 weight-only quantization keeps teacher-forced NLL close on
    a Llama block stack (weight-quant arm of the §4.2 harness)."""
    from flash_attn_tpu.utils.ppl import forward_nll

    cfg = ll.LLAMA_TINY
    params = ll.init_params(cfg, jax.random.PRNGKey(0))
    toks = np.random.RandomState(6).randint(1, cfg.vocab_size, size=32)

    def fwd(p, t):
        return ll.forward(p, t, cfg, interpret=True)

    base = forward_nll(params, cfg, toks, forward_fn=fwd)
    for mode in ("int8", "int4"):
        qp = ll.quantize_weights(params, mode=mode, group_size=32)
        nll = forward_nll(qp, cfg, toks, forward_fn=fwd)
        assert abs(nll - base) / max(base, 1e-6) < 0.08, (mode, nll, base)


def test_qwen2_conversion_logits_and_greedy_match():
    """Qwen-2 = Llama family + qkv bias (ops/matmul.BiasedWeight): the
    conversion wraps q/k/v in BiasedWeight and the whole stack (forward,
    prefill, cached decode) matches a random-init torch Qwen2ForCausalLM
    token-exactly."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from flash_attn_tpu.ops.matmul import BiasedWeight

    torch.manual_seed(7)
    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, use_sliding_window=False,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    params, cfg = ll.convert_hf_model(model, dtype="float32")
    assert cfg.qkv_bias
    assert isinstance(params["blocks"][0]["wq"], BiasedWeight)

    tokens = np.random.RandomState(8).randint(0, 256, size=(1, 16))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(ll.forward(params, jnp.asarray(tokens), cfg,
                                interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)

    # greedy decode through prefill + cached flash-decode
    prompt = np.random.RandomState(9).randint(0, 256, size=(1, 10))
    steps = 6
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(prompt), max_new_tokens=steps, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1]:]
    logits_all, kvs = ll.prefill_with_kv(
        params, jnp.asarray(prompt), jnp.arange(10)[None], cfg,
        interpret=True,
    )
    cache = ll.make_cache(cfg, 1, 32)
    for i, (k, v) in enumerate(kvs):
        cache = cache.append(i, k, v)
    cache = cache.advance(10)
    tok = jnp.argmax(logits_all[:, -1], -1)
    ours = [int(tok[0])]
    for _ in range(steps - 1):
        logits, cache = ll.decode_step(params, tok, cfg, cache,
                                       interpret=True)
        tok = jnp.argmax(logits, -1)
        ours.append(int(tok[0]))
    assert ours == hf_out.tolist(), (ours, hf_out.tolist())


def test_qwen2_quantized_weights_keep_bias():
    """Weight-only quantization recurses through BiasedWeight (inner weight
    quantized, bias kept float) and stays usable end-to-end."""
    from flash_attn_tpu.ops.matmul import BiasedWeight

    cfg = ll.LlamaConfig(
        vocab_size=128, hidden=64, intermediate=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=64,
        rope_theta=10000.0, dtype="float32", qkv_bias=True,
    )
    params = ll.init_params(cfg, jax.random.PRNGKey(11))
    qp = ll.quantize_weights(params, mode="int8")
    wq = qp["blocks"][0]["wq"]
    assert isinstance(wq, BiasedWeight) and isinstance(wq.w, tuple)
    toks = jax.random.randint(jax.random.PRNGKey(12), (1, 12), 0, 128)
    full = ll.forward(params, toks, cfg, interpret=True)
    qlog = ll.forward(qp, toks, cfg, interpret=True)
    agree = float(np.mean(
        np.argmax(np.asarray(full), -1) == np.argmax(np.asarray(qlog), -1)
    ))
    assert agree > 0.7, agree
