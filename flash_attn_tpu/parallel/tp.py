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


# Projection kinds in the llama block pytree (quantized or not): column-
# parallel shard the output dim, row-parallel the input dim.
_LLAMA_COL = ("wq", "wk", "wv", "w_gate", "w_up")
_LLAMA_ROW = ("wo", "w_down")


def shard_params_quant(params, mesh, tp_axis: str = TENSOR_AXIS):
    """Shard a ``llama.quantize_weights`` param tree (int8 tuples or
    Int4Weight leaves) with the same Megatron column/row rules as
    ``llama_param_specs`` (BASELINE config 4: quantized weights under TP).

    int8 leaf (vals [K,N], scale [N]): column-parallel shards N in both;
    row-parallel shards K in vals, replicates the per-output scale.
    Int4Weight (packed [K//2,N], scales [K//g,N]): column-parallel shards
    N in both; row-parallel shards K — valid because the int4 packing is
    group-local (ops/quant.py), so K-shards at group boundaries stay
    self-contained (requires (K//group_size) % tp == 0).
    """
    from flash_attn_tpu.ops.matmul import W4A8Weight, W8A8Weight
    from flash_attn_tpu.ops.quant import Int4Weight

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def place_weight(w, kind):
        if isinstance(w, W4A8Weight):
            # same packed/scales geometry as Int4Weight (halves layout)
            if kind == "col":
                return W4A8Weight(place(w.packed, P(None, tp_axis)),
                                  place(w.scales, P(None, tp_axis)),
                                  w.group_size, w.shape)
            return W4A8Weight(place(w.packed, P(tp_axis, None)),
                              place(w.scales, P(tp_axis, None)),
                              w.group_size, w.shape)
        if isinstance(w, W8A8Weight):
            if kind == "col":
                return W8A8Weight(place(w.vals, P(None, tp_axis)),
                                  place(w.scales, P(tp_axis)))
            return W8A8Weight(place(w.vals, P(tp_axis, None)),
                              place(w.scales, P()))
        if isinstance(w, Int4Weight):
            layout = getattr(w, "layout", "halves")
            if kind == "col":
                return Int4Weight(place(w.packed, P(None, tp_axis)),
                                  place(w.scales, P(None, tp_axis)),
                                  w.group_size, w.shape, layout)
            return Int4Weight(place(w.packed, P(tp_axis, None)),
                              place(w.scales, P(tp_axis, None)),
                              w.group_size, w.shape, layout)
        if isinstance(w, tuple) and len(w) == 2:  # int8 (vals, scale)
            vals, scale = w
            if kind == "col":
                return (place(vals, P(None, tp_axis)), place(scale, P(tp_axis)))
            return (place(vals, P(tp_axis, None)), place(scale, P()))
        return place(
            w, P(None, tp_axis) if kind == "col" else P(tp_axis, None)
        )

    out = {
        "tok_emb": place(params["tok_emb"], P(tp_axis, None)),
        "final_norm": place(params["final_norm"], P()),
        "lm_head": place_weight(params["lm_head"], "col")
        if not isinstance(params["lm_head"], jax.Array)
        else place(params["lm_head"], P(None, tp_axis)),
        "blocks": [],
    }
    for blk in params["blocks"]:
        nb = {}
        for name, w in blk.items():
            if name in ("wqkv", "w_gate_up"):
                # Fused projections concatenate whole projections along the
                # output axis, which does not align with per-device column
                # shards — silently replicating them would defeat TP.  Use
                # the unfused tree under TP (llama.fuse_projections doc).
                raise ValueError(
                    f"shard_params_quant got fused projection {name!r}: "
                    "TP requires the unfused param tree (shard first, or "
                    "skip fuse_projections)"
                )
            if name in _LLAMA_COL:
                nb[name] = place_weight(w, "col")
            elif name in _LLAMA_ROW:
                nb[name] = place_weight(w, "row")
            else:  # norms
                nb[name] = place(w, P())
        out["blocks"].append(nb)
    return out
