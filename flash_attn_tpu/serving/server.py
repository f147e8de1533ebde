"""HTTP serving front-end over the continuous-batching engine.

A minimal production-shaped request API (JSON over HTTP, stdlib-only — no
framework dependency in the zero-egress image):

  POST /generate   {"prompt": [ids...], "max_tokens": N, "adapter": i}
                   -> {"tokens": [...], "uid": u}
  POST /submit     same body -> {"uid": u}          (async)
  GET  /result?uid=u -> {"done": bool, "tokens": [...]}
  GET  /stream?uid=u -> ndjson lines {"tokens": [new...], "done": bool}
                        (incremental tokens as they are generated)
  POST /cancel     {"uid": u} -> {"cancelled": bool}
  GET  /health     -> {"ok": true, "metrics": {...}}

"adapter" selects a LoRA adapter index when the engine was built with a
lora_bank (multi-adapter serving); ignored otherwise.

Design: one background engine thread owns the TPU (JAX is not thread-safe
for concurrent dispatch); HTTP handlers only enqueue requests and read
results under a lock — the serving layer adds no device work of its own.
The engine thread batches whatever is queued (continuous batching), so
concurrent clients share decode steps.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


@dataclass
class ServingConfig:
    host: str = "127.0.0.1"
    port: int = 8477
    poll_interval_s: float = 0.005
    default_max_tokens: int = 64


class _EngineWorker(threading.Thread):
    """Single thread that owns the engine: drains the submit queue, steps
    the engine while work exists, idles otherwise."""

    def __init__(self, engine, poll_interval_s: float):
        super().__init__(daemon=True)
        self.engine = engine
        self.poll = poll_interval_s
        self.lock = threading.Lock()
        self.pending = []  # (uid, prompt, max_tokens)
        self.results = {}  # uid -> Request
        self.stop_flag = threading.Event()
        self._uid = 0

    def submit(self, prompt, max_tokens, adapter=0) -> int:
        with self.lock:
            self._uid += 1
            uid = self._uid
            # register the uid immediately: a client may poll /result
            # before the engine thread drains the queue (a submitted-but-
            # not-yet-admitted request is "not done", not "unknown")
            self.results[uid] = None
            self.pending.append((uid, prompt, max_tokens, adapter))
        return uid

    def result(self, uid):
        with self.lock:
            if uid not in self.results:
                return None
            req = self.results[uid]
        if req is None:
            return {"done": False, "tokens": []}
        return {"done": req.done, "tokens": list(req.generated)}

    def cancel(self, uid):
        with self.lock:
            if uid not in self.results:
                return None
            req = self.results[uid]
            if req is None:
                # not yet drained into the engine: drop it from pending
                self.pending = [p for p in self.pending if p[0] != uid]
                self.results[uid] = _CancelledStub()
                return True
        return self.engine.cancel(req)

    def run(self):
        while not self.stop_flag.is_set():
            with self.lock:
                new = self.pending
                self.pending = []
            for uid, prompt, max_tokens, adapter in new:
                if adapter:
                    req = self.engine.submit(
                        prompt, max_tokens=max_tokens, adapter=adapter
                    )
                else:
                    req = self.engine.submit(prompt, max_tokens=max_tokens)
                with self.lock:
                    self.results[uid] = req
            if self.engine.sched.has_work:
                # bounded burst so fresh submits join the batch promptly
                self.engine.run(max_steps=8)
            else:
                time.sleep(self.poll)


class _CancelledStub:
    done = True
    generated = ()


def _make_handler(worker: _EngineWorker, cfg: ServingConfig):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/health":
                self._json(200, {
                    "ok": True,
                    "metrics": worker.engine.metrics.snapshot(),
                })
            elif url.path == "/result":
                q = parse_qs(url.query)
                try:
                    uid = int(q["uid"][0])
                except (KeyError, ValueError):
                    self._json(400, {"error": "uid required"})
                    return
                res = worker.result(uid)
                if res is None:
                    self._json(404, {"error": f"unknown uid {uid}"})
                else:
                    self._json(200, res)
            elif url.path == "/stream":
                q = parse_qs(url.query)
                try:
                    uid = int(q["uid"][0])
                except (KeyError, ValueError):
                    self._json(400, {"error": "uid required"})
                    return
                if worker.result(uid) is None:
                    self._json(404, {"error": f"unknown uid {uid}"})
                    return
                # incremental ndjson: one line per batch of new tokens.
                # HTTP/1.0 semantics (no Content-Length, stream until
                # close) keep this stdlib-only.
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.end_headers()
                sent = 0
                while True:
                    res = worker.result(uid)
                    toks = res["tokens"]
                    if len(toks) > sent or res["done"]:
                        line = json.dumps(
                            {"tokens": toks[sent:], "done": res["done"]}
                        )
                        try:
                            self.wfile.write(line.encode() + b"\n")
                            self.wfile.flush()
                        except BrokenPipeError:
                            return  # client went away; engine finishes anyway
                        sent = len(toks)
                        if res["done"]:
                            return
                    time.sleep(cfg.poll_interval_s)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/cancel":
                try:
                    uid = int(self._read_body()["uid"])
                except (KeyError, ValueError, json.JSONDecodeError):
                    self._json(400, {"error": "uid required"})
                    return
                res = worker.cancel(uid)
                if res is None:
                    self._json(404, {"error": f"unknown uid {uid}"})
                else:
                    self._json(200, {"cancelled": bool(res)})
                return
            try:
                body = self._read_body()
                prompt = [int(t) for t in body["prompt"]]
            except (KeyError, ValueError, json.JSONDecodeError):
                self._json(400, {"error": "body must be JSON with 'prompt'"})
                return
            max_tokens = int(body.get("max_tokens", cfg.default_max_tokens))
            adapter = int(body.get("adapter", 0))
            uid = worker.submit(prompt, max_tokens, adapter)
            if url.path == "/submit":
                self._json(200, {"uid": uid})
            elif url.path == "/generate":
                # synchronous: poll until done
                while True:
                    res = worker.result(uid)
                    if res is not None and res["done"]:
                        res["uid"] = uid
                        self._json(200, res)
                        return
                    time.sleep(cfg.poll_interval_s)
            else:
                self._json(404, {"error": "not found"})

    return Handler


def serve(engine, config: ServingConfig | None = None, *, block: bool = True):
    """Start serving ``engine`` over HTTP.  Returns (server, worker); with
    block=False the caller owns shutdown (server.shutdown();
    worker.stop_flag.set())."""
    cfg = config or ServingConfig()
    worker = _EngineWorker(engine, cfg.poll_interval_s)
    worker.start()
    server = ThreadingHTTPServer(
        (cfg.host, cfg.port), _make_handler(worker, cfg)
    )
    if block:
        try:
            server.serve_forever()
        finally:
            worker.stop_flag.set()
    else:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
    return server, worker
