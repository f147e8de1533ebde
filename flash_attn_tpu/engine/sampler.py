"""Token sampling: greedy / temperature / top-k / top-p, jittable."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0            # 0 => disabled
    top_p: float = 1.0        # 1 => disabled
    max_tokens: int = 128


def sample(logits: jax.Array, key, params: SamplingParams) -> jax.Array:
    """logits [B, V] -> tokens [B]."""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / params.temperature
    if params.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -params.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; cutoff = last kept logit
        keep = cum - probs < params.top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)
