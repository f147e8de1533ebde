"""Aux subsystems: roofline accounting, metrics, checkpoint/resume, PP."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_roofline_accounting():
    from flash_attn_tpu.utils.profiling import Roofline, attention_fwd_cost, decode_cost

    r = Roofline(flops=1e12, bytes=1e9, chip="v5e")
    assert r.compute_bound  # 5ms compute vs 1.2ms memory
    assert abs(r.ideal_seconds - 1e12 / 197e12) < 1e-9
    rep = r.report(0.02)
    assert rep["bound"] == "compute" and rep["tflops"] == 50.0

    d = decode_cost(8, 8192, 32, 8, 128, kv_bytes=1, scale_bytes=4)
    assert not d.compute_bound  # decode is memory-bound

    a = attention_fwd_cost(4, 2048, 2048, 16, 128, causal=True)
    assert a.compute_bound


def test_engine_metrics_snapshot():
    from flash_attn_tpu.utils.metrics import EngineMetrics

    m = EngineMetrics()
    m.record_prefill(512, 0.1)
    m.record_decode(8, 0.004)
    m.record_decode(8, 0.004)
    m.kv_tokens_in_use, m.kv_capacity = 100, 1000
    snap = m.snapshot()
    assert snap["prefill_tokens_per_s"] == pytest.approx(5120, rel=0.01)
    assert snap["decode_step_ms"] == pytest.approx(4.0, rel=0.01)
    assert snap["kv_occupancy"] == 0.1


def test_checkpoint_roundtrip(tmp_path):
    from flash_attn_tpu.utils import checkpoint

    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "nested": {"b": jnp.ones((5,), jnp.bfloat16)},
    }
    path = os.path.join(tmp_path, "ckpt")
    checkpoint.save(path, tree)
    restored = checkpoint.load(path, like=tree)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))
    assert restored["nested"]["b"].dtype == jnp.bfloat16


def test_pipeline_apply_matches_sequential():
    from flash_attn_tpu.parallel.pp import pipeline_apply, split_layers

    layers = [lambda h, i=i: h * 2.0 + i for i in range(4)]
    x = jnp.arange(8.0).reshape(8, 1)
    want = x
    for l in layers:
        want = l(want)
    got = pipeline_apply(layers, x, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    stages = split_layers(list(range(7)), 3)
    assert [len(s) for s in stages] == [3, 3, 1]


def test_pipeline_spmd_ring():
    from jax.sharding import PartitionSpec as P

    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.pp import pipeline_spmd

    n = 4
    mesh = make_mesh(MeshConfig(sp=n))
    # stage s applies h * ws + s, with per-stage weights stacked on axis 0
    ws = jnp.asarray([1.0, 2.0, 0.5, 3.0]).reshape(n, 1, 1)
    num_mb, mb, d = 6, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (num_mb, mb, d))

    def stage_fn(w_local, h):
        return h * w_local[0]

    fn = jax.shard_map(
        lambda w, xx: pipeline_spmd(
            stage_fn, w, xx, axis_name="sp", num_microbatches=num_mb
        ),
        mesh=mesh,
        in_specs=(P("sp", None, None), P(None, None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    got = fn(ws, x)
    want = x * float(jnp.prod(ws))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
