"""Training utilities: optax-based train step factory with DP/TP shardings,
gradient accumulation and rematerialisation — the training-side counterpart
of the engine (completes flash_attn.h:68-134 bwd parity at the system level).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

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
