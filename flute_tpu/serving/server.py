"""Minimal OpenAI-style HTTP completion server over continuous batching.

Role-equivalent of the reference's serving entry point
(``python -m flute.integrations.vllm vllm.entrypoints.openai.api_server …``,
reference vllm.py:28-50) — but owned by the framework instead of delegated:
a stdlib ThreadingHTTPServer front-end feeding the slot-based
:class:`~flute_tpu.serving.continuous.ContinuousBatchingEngine`, with a
single background device thread stepping the engine (JAX dispatch is not
thread-safe across requests; the queue is).

Endpoints:
  POST /v1/completions   {"prompt": [token ids] | "text", "max_tokens": N}
  GET  /health
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from flute_tpu.serving.continuous import ContinuousBatchingEngine


class ServingLoop:
    """Background thread that steps the engine whenever work is queued."""

    def __init__(self, engine: ContinuousBatchingEngine, tokenizer=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self._lock = threading.Lock()
        self._results: dict[int, Any] = {}
        self._events: dict[int, threading.Event] = {}
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, prompt_ids, max_tokens: int) -> int:
        with self._lock:
            rid = self.engine.submit(prompt_ids, max_new_tokens=max_tokens)
            self._events[rid] = threading.Event()
        return rid

    def wait(self, rid: int, timeout: float = 300.0):
        ev = self._events[rid]
        if not ev.wait(timeout):
            raise TimeoutError(f"request {rid} timed out")
        with self._lock:
            self._events.pop(rid, None)
            return self._results.pop(rid)

    def _run(self):
        while not self._stop:
            with self._lock:
                busy = self.engine.step()
                done = self.engine._finished
                if done:
                    for rid, toks in list(done.items()):
                        self._results[rid] = toks
                        ev = self._events.get(rid)
                        if ev is not None:
                            ev.set()
                    self.engine._finished = {}
            if not busy:
                time.sleep(0.005)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=2)


def make_handler(loop: ServingLoop):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/v1/completions", "/completions"):
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req.get("prompt")
                if isinstance(prompt, str):
                    if loop.tokenizer is None:
                        raise ValueError(
                            "text prompts require a tokenizer; send token ids"
                        )
                    prompt = loop.tokenizer(prompt)["input_ids"]
                if not isinstance(prompt, list) or not prompt:
                    raise ValueError("prompt must be a non-empty token list")
                max_tokens = int(req.get("max_tokens", 64))
                rid = loop.submit(prompt, max_tokens)
                toks = loop.wait(rid)
                out: dict = {"id": rid, "tokens": toks}
                if loop.tokenizer is not None:
                    out["text"] = loop.tokenizer.decode(toks)
                self._send(200, out)
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, {"error": str(e)})

    return Handler


def serve(
    engine: ContinuousBatchingEngine,
    host: str = "127.0.0.1",
    port: int = 8000,
    tokenizer=None,
) -> ThreadingHTTPServer:
    """Start the HTTP server (non-blocking; returns the server object).
    Call ``server.shutdown()`` / ``server.loop.shutdown()`` to stop."""
    loop = ServingLoop(engine, tokenizer)
    server = ThreadingHTTPServer((host, port), make_handler(loop))
    server.loop = loop  # type: ignore[attr-defined]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
