"""HTTP serving front-end over the engine (ROADMAP item 10): concurrent
clients share continuous-batched decode steps; results match greedy."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.engine.engine import InferenceEngine
from flash_attn_tpu.models import gpt2
from flash_attn_tpu.serving import ServingConfig, serve


@pytest.fixture(scope="module")
def server():
    cfg = gpt2.GPT2_TINY
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(
        params, gpt2.make_adapter(cfg, interpret=True),
        max_batch=2, capacity=64, cache_dtype=jnp.dtype(cfg.dtype),
    )
    # port=0: ephemeral OS-assigned port, so parallel pytest workers (and
    # concurrent CI runs) never collide; the bound port is read back from
    # the server socket.
    scfg = ServingConfig(port=0)
    srv, worker = serve(eng, scfg, block=False)
    scfg.port = srv.server_address[1]
    yield scfg, cfg, params
    srv.shutdown()
    worker.stop_flag.set()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=120
    ) as r:
        return json.loads(r.read())


def test_generate_matches_greedy(server):
    scfg, cfg, params = server
    prompt = [1, 2, 3, 4]
    res = _post(scfg.port, "/generate", {"prompt": prompt, "max_tokens": 5})
    want = gpt2.greedy_decode(
        params, jnp.asarray([prompt]), cfg, steps=5, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(res["tokens"]), np.asarray(want[0]))


def test_async_submit_and_result(server):
    scfg, cfg, params = server
    sub = _post(scfg.port, "/submit", {"prompt": [7, 8, 9], "max_tokens": 4})
    uid = sub["uid"]
    import time

    for _ in range(500):
        res = _get(scfg.port, f"/result?uid={uid}")
        if res["done"]:
            break
        time.sleep(0.05)
    assert res["done"]
    want = gpt2.greedy_decode(
        params, jnp.asarray([[7, 8, 9]]), cfg, steps=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(res["tokens"]), np.asarray(want[0]))


def test_concurrent_clients_batched(server):
    scfg, cfg, params = server
    results = {}

    def client(i):
        prompt = [i + 1, i + 2]
        results[i] = (
            prompt,
            _post(scfg.port, "/generate", {"prompt": prompt, "max_tokens": 3}),
        )

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for i, (prompt, res) in results.items():
        want = gpt2.greedy_decode(
            params, jnp.asarray([prompt]), cfg, steps=3, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(res["tokens"]), np.asarray(want[0]), err_msg=str(i)
        )


def test_health_and_errors(server):
    scfg, *_ = server
    h = _get(scfg.port, "/health")
    assert h["ok"] and "decode_tokens_per_s" in h["metrics"]
    # bad request
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(scfg.port, "/generate", {"nope": 1})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(scfg.port, "/result?uid=99999")
    assert e.value.code == 404


def test_stream_endpoint_incremental(server):
    """GET /stream delivers ndjson lines whose concatenated tokens equal
    the final /result tokens."""
    scfg, cfg, params = server
    prompt = [5, 6, 7]
    uid = _post(scfg.port, "/submit", {"prompt": prompt, "max_tokens": 6})["uid"]
    lines = []
    with urllib.request.urlopen(
        f"http://127.0.0.1:{scfg.port}/stream?uid={uid}", timeout=120
    ) as r:
        for raw in r:
            lines.append(json.loads(raw))
    assert lines and lines[-1]["done"]
    streamed = [t for ln in lines for t in ln["tokens"]]
    final = _get(scfg.port, f"/result?uid={uid}")
    assert final["done"]
    np.testing.assert_array_equal(np.asarray(streamed),
                                  np.asarray(final["tokens"]))
