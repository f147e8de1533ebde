"""Training utilities: optax-based train step factory with DP/TP shardings,
gradient accumulation and rematerialisation — the training-side counterpart
of the engine (completes flash_attn.h:68-134 bwd parity at the system level).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    accum_steps: int = 1
    remat: bool = True  # jax.checkpoint the per-layer forward


def cross_entropy(logits, targets, mask=None):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        nll = nll * mask
        return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(nll)


def chunked_cross_entropy(x, head, targets, mask=None, chunk: int = 1024):
    """Cross-entropy straight from hidden states, never materialising the
    full [B, S, V] fp32 logits (at Llama-3's 128k vocab that array is 8x
    the hidden states; it dominates training-step memory).

    Scans over sequence chunks; each step computes [B, chunk, V] logits,
    reduces them to (sum_nll, count), and is rematerialised
    (jax.checkpoint) so the backward recomputes per-chunk logits instead
    of saving them — peak memory is one chunk's logits in both passes.
    Gradients flow to both ``x`` and ``head``.

    x: [B, S, H] hidden states (pre-head); head: [H, V] (pass
    ``params['tok_emb'].T`` for tied embeddings); targets [B, S] int;
    mask [B, S] optional.  Returns mean nll over unmasked positions.
    """
    B, S, H = x.shape
    c = min(chunk, S)
    pad = (-S) % c
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        mask = jnp.pad(
            jnp.ones((B, S), jnp.float32) if mask is None else mask,
            ((0, 0), (0, pad)),
        )
    elif mask is None:
        mask = jnp.ones((B, S), jnp.float32)
    n = x.shape[1] // c
    xs = jnp.moveaxis(x.reshape(B, n, c, H), 1, 0)
    ts = jnp.moveaxis(targets.reshape(B, n, c), 1, 0)
    ms = jnp.moveaxis(mask.astype(jnp.float32).reshape(B, n, c), 1, 0)

    @jax.checkpoint
    def body(carry, xs_):
        xc, tc, mc = xs_
        logits = xc.astype(jnp.float32) @ head.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tc[..., None], axis=-1)[..., 0]
        nll = (lse - picked) * mc
        return (carry[0] + jnp.sum(nll), carry[1] + jnp.sum(mc)), None

    (total, count), _ = jax.lax.scan(body, (0.0, 0.0), (xs, ts, ms))
    return total / jnp.maximum(count, 1.0)


def make_train_step(forward_fn: Callable, tcfg: TrainConfig):
    """forward_fn(params, tokens) -> logits [B, S, V].

    Returns (init_fn(params) -> opt_state,
             step_fn(params, opt_state, tokens, targets, mask) ->
                 (params, opt_state, metrics)).
    Wrap step_fn in jax.jit with in/out shardings for DP/TP.
    """
    import optax

    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(tcfg.learning_rate, weight_decay=tcfg.weight_decay),
    )

    fwd = forward_fn
    if tcfg.remat:
        fwd = jax.checkpoint(forward_fn)

    def loss_fn(params, tokens, targets, mask):
        logits = fwd(params, tokens)
        return cross_entropy(logits, targets, mask)

    def init_fn(params):
        return tx.init(params)

    def step_fn(params, opt_state, tokens, targets, mask=None):
        if tcfg.accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, mask)
        else:
            # microbatch gradient accumulation via scan (constant memory)
            n = tcfg.accum_steps
            mb_tok = jnp.reshape(tokens, (n, -1) + tokens.shape[1:])
            mb_tgt = jnp.reshape(targets, (n, -1) + targets.shape[1:])
            mb_msk = (
                jnp.ones(mb_tok.shape, jnp.float32)
                if mask is None
                else jnp.reshape(mask, (n, -1) + mask.shape[1:])
            )

            def body(carry, xs):
                acc_loss, acc_grads = carry
                tok, tgt, msk = xs
                l, g = jax.value_and_grad(loss_fn)(params, tok, tgt, msk)
                return (
                    acc_loss + l / n,
                    jax.tree.map(lambda a, b: a + b / n, acc_grads, g),
                ), None

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            (loss, grads), _ = jax.lax.scan(
                body, (0.0, zero_grads), (mb_tok, mb_tgt, mb_msk)
            )

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return init_fn, step_fn


def train_tiny_lm(cfg, corpus, steps, key, *, batch=16, seqlen=128,
                  learning_rate=3e-3, interpret=False):
    """Train a small Llama on a 1-D token corpus with fixed pre-cropped
    batches, the whole step schedule as ONE jitted lax.scan (a single
    dispatch through the axon relay).  Deterministic: crops come from
    numpy rng(0).  Returns (params, losses[steps]).

    Shared by bench.bench_ppl_trained (the trained-model quantization
    ladder) and tools/demo_draft_spec.py (the draft-model speculation
    demo) — one recipe, two consumers.
    """
    import numpy as np

    from flash_attn_tpu.models import llama

    params = llama.init_params(cfg, key)
    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(corpus) - seqlen - 1, (steps, batch))
    data = np.stack([
        np.stack([corpus[s : s + seqlen + 1] for s in row])
        for row in starts
    ])  # [steps, batch, seqlen+1]

    def fwd(p, tokens):
        return llama.forward(p, tokens, cfg, interpret=interpret)

    init_fn, step_fn = make_train_step(
        fwd, TrainConfig(learning_rate=learning_rate)
    )
    opt_state = init_fn(params)

    @jax.jit
    def train_all(params, opt_state, data):
        def one(carry, batch_):
            p, o = carry
            p, o, m = step_fn(p, o, batch_[:, :-1], batch_[:, 1:])
            return (p, o), m["loss"]

        (params, _), losses = jax.lax.scan(one, (params, opt_state), data)
        return params, losses

    params, losses = train_all(params, opt_state, jnp.asarray(data))
    return params, losses
