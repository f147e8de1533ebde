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


def test_split_layers():
    from flash_attn_tpu.parallel.pp import split_layers

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


def test_moe_ep_matches_dense_oracle():
    from jax.sharding import PartitionSpec as P

    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.moe import make_moe_ffn, moe_ffn_reference

    mesh = make_mesh(MeshConfig(tp=4))
    T, H, F, E = 16, 32, 64, 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (T, H))
    router_w = jax.random.normal(ks[1], (H, E))
    w_gate = jax.random.normal(ks[2], (E, H, F)) * 0.1
    w_up = jax.random.normal(ks[3], (E, H, F)) * 0.1
    w_down = jax.random.normal(ks[4], (E, F, H)) * 0.1

    want = moe_ffn_reference(x, router_w, w_gate, w_up, w_down, top_k=2)
    fn = make_moe_ffn(mesh, top_k=2)
    got = fn(x, router_w, w_gate, w_up, w_down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_train_step_reduces_loss():
    from flash_attn_tpu.models import gpt2
    from flash_attn_tpu.utils.train import TrainConfig, make_train_step

    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    fwd = lambda p, t: gpt2.forward(p, t, cfg, interpret=True)
    init_fn, step_fn = make_train_step(fwd, TrainConfig(learning_rate=1e-3, remat=False))
    opt_state = init_fn(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    targets = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    losses = []
    for _ in range(4):
        params, opt_state, m = step_fn(params, opt_state, tokens, targets)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_train_step_grad_accum_matches_single():
    from flash_attn_tpu.models import gpt2
    from flash_attn_tpu.utils.train import TrainConfig, make_train_step

    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(3))
    fwd = lambda p, t: gpt2.forward(p, t, cfg, interpret=True)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, cfg.vocab_size)
    targets = jax.random.randint(jax.random.PRNGKey(5), (4, 8), 0, cfg.vocab_size)

    _, step1 = make_train_step(fwd, TrainConfig(accum_steps=1, remat=False))
    _, step2 = make_train_step(fwd, TrainConfig(accum_steps=2, remat=False))
    init_fn, _ = make_train_step(fwd, TrainConfig(remat=False))
    p1, _, m1 = step1(params, init_fn(params), tokens, targets)
    p2, _, m2 = step2(params, init_fn(params), tokens, targets)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_chunked_cross_entropy_matches_dense():
    """chunked_cross_entropy (scan + remat, no [B,S,V] materialisation) ==
    dense cross_entropy in value AND gradients (x and head), incl. masks
    and a non-divisible chunk size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attn_tpu.utils.train import chunked_cross_entropy, cross_entropy

    B, S, H, V = 2, 25, 16, 97
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, H))
    head = jax.random.normal(jax.random.PRNGKey(1), (H, V)) * 0.1
    tgt = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, V)
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (B, S)) > 0.3).astype(
        jnp.float32
    )

    def dense(x, head):
        return cross_entropy(x @ head, tgt, mask)

    def chunked(x, head):
        return chunked_cross_entropy(x, head, tgt, mask, chunk=8)

    want, (gxw, ghw) = jax.value_and_grad(dense, argnums=(0, 1))(x, head)
    got, (gx, gh) = jax.value_and_grad(chunked, argnums=(0, 1))(x, head)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxw),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(ghw),
                               atol=1e-5, rtol=1e-5)


def test_moe_ep_a2a_matches_dense_oracle():
    """Capacity-based all_to_all EP dispatch == dense oracle when capacity
    is generous enough that no (token, expert) slot drops."""
    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.moe import make_moe_ffn_a2a, moe_ffn_reference

    mesh = make_mesh(MeshConfig(tp=4))
    T, H, F, E = 16, 32, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (T, H))
    router_w = jax.random.normal(ks[1], (H, E))
    w_gate = jax.random.normal(ks[2], (E, H, F)) * 0.1
    w_up = jax.random.normal(ks[3], (E, H, F)) * 0.1
    w_down = jax.random.normal(ks[4], (E, F, H)) * 0.1

    want = moe_ffn_reference(x, router_w, w_gate, w_up, w_down, top_k=2)
    # worst case: all T*k local choices land on one expert
    fn = make_moe_ffn_a2a(mesh, axis_name="tp", top_k=2, capacity=T * 2)
    got = jax.jit(fn)(x, router_w, w_gate, w_up, w_down)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_moe_ep_a2a_capacity_drop():
    """With capacity 1 per expert, overflowing (token, expert) slots drop
    (GShard overflow rule): output stays finite and differs from the
    no-drop result only for dropped slots."""
    from flash_attn_tpu.parallel.mesh import MeshConfig, make_mesh
    from flash_attn_tpu.parallel.moe import make_moe_ffn_a2a

    mesh = make_mesh(MeshConfig(tp=4))
    T, H, F, E = 16, 32, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (T, H))
    router_w = jax.random.normal(ks[1], (H, E))
    w_gate = jax.random.normal(ks[2], (E, H, F)) * 0.1
    w_up = jax.random.normal(ks[3], (E, H, F)) * 0.1
    w_down = jax.random.normal(ks[4], (E, F, H)) * 0.1

    fn = make_moe_ffn_a2a(mesh, axis_name="tp", top_k=2, capacity=1)
    got = jax.jit(fn)(x, router_w, w_gate, w_up, w_down)
    assert got.shape == (T, H)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_autotune_decode_and_paged_lookups(monkeypatch):
    """Shipped-table entries override the static decode/paged block choices
    (VERDICT r2 item 9: bwd/paged pick tuned blocks with no explicit
    config), and unknown keys fall back to the measured heuristics."""
    from flash_attn_tpu.ops.decode import _default_block_k
    from flash_attn_tpu.utils import autotune

    monkeypatch.setattr(autotune, "_cache", {
        "dec:int8": {"block_k": 1024},
        "paged:256xfloat8_e4m3fn": {"target_rows": 4096},
    })
    assert autotune.get_decode_block_k(jnp.dtype("int8")) == 1024
    assert _default_block_k(jnp.dtype("int8")) == 1024
    # no entry -> heuristic (1-byte KV: 2048; 2-byte: 512)
    assert _default_block_k(jnp.dtype(jnp.float8_e4m3fn)) == 2048
    assert _default_block_k(jnp.dtype(jnp.bfloat16)) == 512
    assert autotune.get_paged_rows(256, jnp.dtype(jnp.float8_e4m3fn)) == 4096
    assert autotune.get_paged_rows(512, jnp.dtype(jnp.bfloat16)) is None


def test_train_kill_restart_recovery(tmp_path):
    """End-to-end failure recovery (SURVEY.md §5; r3 VERDICT's one partial
    component): a training subprocess is SIGKILLed mid-run, restarted, and
    resumes from the latest checkpoint — final params match an
    uninterrupted run bit-for-bit (deterministic CPU math + per-step
    seeded data)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    driver = os.path.join(os.path.dirname(__file__), "_train_driver.py")
    repo = os.path.dirname(os.path.dirname(driver))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    total = 6

    def run(workdir, wait=True):
        p = subprocess.Popen(
            [sys.executable, driver, str(workdir), str(total)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        if wait:
            out, _ = p.communicate(timeout=600)
            assert p.returncode == 0, out.decode()[-2000:]
        return p

    # interrupted run: SIGKILL once progress shows >= 2 completed steps
    wa = tmp_path / "a"
    wa.mkdir()
    p = run(wa, wait=False)
    progress = wa / "progress.txt"
    deadline = time.time() + 600
    while time.time() < deadline:
        if progress.exists():
            try:
                if int(progress.read_text()) >= 2:
                    break
            except ValueError:
                pass
        if p.poll() is not None:
            raise AssertionError(
                "driver exited before it could be killed: "
                + p.stdout.read().decode()[-2000:]
            )
        time.sleep(0.5)
    else:
        raise AssertionError("driver never reached step 2")
    p.send_signal(signal.SIGKILL)  # hard failure, no cleanup
    p.wait()
    run(wa)  # restart: resumes from the latest checkpoint

    # uninterrupted reference run
    wb = tmp_path / "b"
    wb.mkdir()
    run(wb)

    a = np.load(wa / "final.npz")
    b = np.load(wb / "final.npz")
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_bench_ppl_trained_smoke():
    """bench.bench_ppl_trained (the trained-model quantization ladder)
    runs end-to-end in interpret mode: trains on repo-source bytes, scores
    held-out bytes under every weight mode, returns finite NLLs."""
    import math
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    out = bench.bench_ppl_trained(None, steps=4, windows=1, interpret=True)
    for k in ("ppl_trained_nll_float", "ppl_trained_nll_int8",
              "ppl_trained_nll_int4", "ppl_trained_nll_w4a8",
              "ppl_trained_nll_int4_fp8"):
        assert math.isfinite(out[k]), (k, out)
    # 4 steps cannot train, but scores must stay near the uniform ceiling
    assert out["ppl_trained_nll_float"] < math.log(256.0) + 1.0


def test_bench_emit_final_line_stays_short(tmp_path):
    """The driver json-parses the LAST stdout line and keeps only the tail
    of our output — the final line must stay short no matter how large the
    details dict grows (rounds 3/4 regression: BENCH_r03/r04 "parsed": null)."""
    import io
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    details = {f"filler_metric_{i}": float(i) * 1.2345 for i in range(400)}
    details["decode_fp8_roofline_frac"] = 0.91
    details["engine_steady_vs_raw_ratio"] = 1.07
    buf = io.StringIO()
    bench.emit_result(details, out=buf, details_path=str(tmp_path / "d.json"))
    lines = buf.getvalue().strip().splitlines()
    last = json.loads(lines[-1])
    assert len(lines[-1]) < 1000
    assert last["metric"] == "decode_attention_roofline_frac_fp8kv"
    assert last["value"] == 0.91
    assert last["vs_baseline"] == round(0.91 / 0.90, 4)
    assert last["details"]["engine_steady_vs_raw_ratio"] == 1.07
    # the full dict rides the earlier line + the details file
    assert json.loads(lines[0])["details"]["filler_metric_399"] == details["filler_metric_399"]
    assert json.loads((tmp_path / "d.json").read_text())["decode_fp8_roofline_frac"] == 0.91
