"""Online serving: a JSON-over-HTTP frontend on the continuous-batching
engine.

The reference's serving surface is an interactive REPL (inference/demo.py)
around a batch-1 stream generator; this frontend is the production shape of
the same capability: requests arrive over HTTP at any time, join the
engine's slot batch mid-flight (Engine.run's feeder hook), carry their own
sampling params, and are answered when they finish. Stdlib-only
(http.server), one engine thread, any number of handler threads.

API:
  POST /generate  {"prompt": str | "prompt_tokens": [int], "max_new_tokens",
                   "temperature", "top_k", "top_p", "repetition_penalty",
                   "stop_token_ids", "template"}
     -> {"text", "tokens", "finish_reason", "prefill_time_s",
         "decode_tokens", "decode_time_s"}
  GET  /health    -> {"ok": true, "active_slots": n, "queued": n}
"""

from __future__ import annotations

import json
import queue
import threading

from .engine import Engine, Request
from .sampling import SamplingParams

_SAMPLING_KEYS = ("temperature", "top_k", "top_p", "repetition_penalty")


class ServingFrontend:
    """HTTP server + engine loop. `serve_forever()` runs the engine in the
    calling thread (it owns the TPU) and HTTP handlers in daemon threads."""

    def __init__(self, engine: Engine, tokenizer, host="127.0.0.1", port=8000):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.engine = engine
        self.tok = tokenizer
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._stop = threading.Event()
        frontend = self

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

            def do_GET(self):
                if self.path != "/health":
                    return self._json(404, {"error": "not found"})
                eng = frontend.engine
                self._json(200, {
                    "ok": True,
                    "active_slots": int(eng.active.sum()),
                    "queued": frontend.queue.qsize(),
                    "prompt_cache_hits": eng.prompt_cache_hits,
                    "prompt_cache_misses": eng.prompt_cache_misses,
                })

            def do_POST(self):
                if self.path != "/generate":
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    req = frontend._build_request(body)
                except Exception as e:  # malformed request
                    return self._json(400, {"error": str(e)})
                if body.get("stream"):
                    return self._stream(req)
                evt = threading.Event()
                req.on_finish = lambda _r: evt.set()
                frontend.queue.put(req)
                if not evt.wait(timeout=600):
                    return self._json(504, {"error": "generation timed out"})
                self._json(200, {
                    "text": frontend.tok.decode(req.output_tokens),
                    "tokens": req.output_tokens,
                    "finish_reason": req.finish_reason,
                    "prefill_time_s": req.prefill_time,
                    "decode_tokens": req.decode_tokens,
                    "decode_time_s": req.decode_time,
                })

            def _stream(self, req):
                """Server-sent events: one `data:` line per token as the
                engine emits it (stream_gen.py's per-token yield, over HTTP)."""
                tokens: "queue.Queue" = queue.Queue()
                req.stream = tokens.put
                req.on_finish = lambda _r: tokens.put(None)
                frontend.queue.put(req)
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                while True:
                    t = tokens.get(timeout=600)
                    if t is None:
                        payload = {"done": True,
                                   "finish_reason": req.finish_reason,
                                   "text": frontend.tok.decode(req.output_tokens)}
                    else:
                        payload = {"token": int(t),
                                   "text": frontend.tok.decode([t])}
                    self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())
                    self.wfile.flush()
                    if t is None:
                        return

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.address = self.httpd.server_address  # resolved port when port=0

    def _build_request(self, body: dict) -> Request:
        if "prompt_tokens" in body:
            toks = [int(t) for t in body["prompt_tokens"]]
        else:
            prompt = body["prompt"]
            if body.get("template"):
                from ..utils.prompts import render_prompt

                prompt = render_prompt(body["template"], prompt)
            toks = self.tok.encode(prompt)
        sampling = None
        if any(k in body for k in _SAMPLING_KEYS):
            base = self.engine.sampling
            sampling = SamplingParams(
                temperature=float(body.get("temperature", base.temperature)),
                top_k=int(body.get("top_k", base.top_k)),
                top_p=float(body.get("top_p", base.top_p)),
                repetition_penalty=float(
                    body.get("repetition_penalty", base.repetition_penalty)
                ),
            )
            if sampling == base:
                # identical to the engine defaults: stay on the uniform
                # sampling fast path (the custom path pays a per-step
                # [B, V] sort for top-p once ANY active slot is custom)
                sampling = None
        return Request(
            prompt_tokens=toks,
            max_new_tokens=int(body.get("max_new_tokens", 256)),
            sampling=sampling,
            stop_token_ids=tuple(body.get("stop_token_ids", ())),
            cache_prompt=bool(body.get("cache_prompt", False)),
        )

    def _feeder(self, idle: bool) -> list:
        out = []
        try:
            if idle:  # nothing decoding: block briefly instead of spinning
                out.append(self.queue.get(timeout=0.05))
            while True:
                out.append(self.queue.get_nowait())
        except queue.Empty:
            pass
        return out

    def serve_forever(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        try:
            self.engine.run([], feeder=self._feeder, stop=self._stop.is_set)
        finally:
            self.httpd.shutdown()

    def shutdown(self):
        self._stop.set()
