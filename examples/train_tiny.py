"""Train a tiny Llama on random tokens — the end-to-end training slice
(flash fwd+bwd kernels, chunked cross-entropy, optax step, remat).

    python examples/train_tiny.py --steps 20
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=128)
    args = ap.parse_args()

    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.train import (
        TrainConfig, chunked_cross_entropy, make_train_step,
    )

    cfg = llama.LLAMA_TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))

    def fwd(p, tokens):
        return llama.forward(p, tokens, cfg)

    init_fn, step_fn = make_train_step(fwd, TrainConfig(learning_rate=1e-3))
    opt_state = init_fn(params)
    step = jax.jit(step_fn)

    key = jax.random.PRNGKey(1)
    data = jax.random.randint(
        key, (args.batch, args.seqlen + 1), 0, cfg.vocab_size
    )
    tokens, targets = data[:, :-1], data[:, 1:]
    for i in range(args.steps):
        params, opt_state, m = step(params, opt_state, tokens, targets)
        print(f"step {i}: loss {float(m['loss']):.4f} "
              f"gnorm {float(m['grad_norm']):.3f}", flush=True)

    # the memory-lean loss path (no [B, S, V] materialisation)
    x = params["tok_emb"][tokens]
    loss = chunked_cross_entropy(x, params["lm_head"], targets)
    print(f"chunked CE on embeddings-only model head: {float(loss):.4f}")


if __name__ == "__main__":
    main()
