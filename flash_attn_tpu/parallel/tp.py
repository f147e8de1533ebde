"""Tensor-parallel sharding rules (Megatron-style) expressed as PartitionSpec
trees for pjit — parallelism is *sharding annotations*, not new entry points
(SURVEY.md §7 design stance).

Column-parallel: qkv / gate / up projections (output dim over 'tp').
Row-parallel: attention out-proj / mlp down-proj (input dim over 'tp');
XLA inserts the psum on the following contraction automatically when the
activations' shardings meet.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_tpu.parallel.mesh import TENSOR_AXIS


def llama_param_specs(tp_axis: str = TENSOR_AXIS):
    """PartitionSpec tree matching models/llama.py param pytree."""
    col = P(None, tp_axis)   # [in, out/tp]
    row = P(tp_axis, None)   # [in/tp, out]
    rep = P()
    block = {
        "attn_norm": rep,
        "mlp_norm": rep,
        "wq": col,
        "wk": col,
        "wv": col,
        "wo": row,
        "w_gate": col,
        "w_up": col,
        "w_down": row,
    }
    return {
        "tok_emb": P(tp_axis, None),     # vocab-sharded embedding
        "blocks": block,                  # same spec for every layer (broadcast)
        "final_norm": rep,
        "lm_head": col,
    }


def gpt2_param_specs(tp_axis: str = TENSOR_AXIS):
    col = P(None, tp_axis)
    row = P(tp_axis, None)
    rep = P()
    dense_col = {"w": col, "b": P(tp_axis)}
    dense_row = {"w": row, "b": rep}
    ln = {"g": rep, "b": rep}
    block = {
        "ln_1": ln,
        "attn": {"qkv": dense_col, "proj": dense_row},
        "ln_2": ln,
        "mlp": {"fc": dense_col, "proj": dense_row},
    }
    return {
        "wte": P(tp_axis, None),
        "wpe": rep,
        "blocks": block,
        "ln_f": ln,
    }


def shard_params(params, mesh, specs):
    """Apply a spec tree to a param pytree (specs for 'blocks' broadcast over
    the per-layer list)."""

    def place(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    out = {}
    for key, val in params.items():
        spec = specs[key]
        if key == "blocks":
            out[key] = [jax.tree.map(place, blk, spec) for blk in val]
        else:
            out[key] = jax.tree.map(place, val, spec) if isinstance(spec, dict) else place(val, spec)
    return out
