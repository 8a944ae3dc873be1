"""HTTP front-end for the serving engine (stdlib only).

Completes the production story: a deployed model is reached over a socket,
not a Python API. This module exposes ``InferenceEngine`` behind a
threaded HTTP server with a vLLM-style surface:

  POST /generate    {"prompt": [ids], "max_new_tokens": N,
                     "temperature": t, "adapter": name, "prefix": name,
                     "stream": bool}
                    -> {"tokens": [...], "finish_reason": "...",
                        "queue_time": s, "prefill_time": s,
                        "decode_time": s}
                    or, with "stream": true, an SSE stream of
                    ``data: {"token": id}`` events ending with
                    ``data: {"done": true, ...}``.
  GET  /stats       engine counters (occupancy, queue depth, tokens out).
  GET  /healthz     liveness.

Threading model: HTTP handlers never touch the engine directly. A single
dispatch thread owns the engine — it drains a thread-safe submission
queue, calls ``engine.step()`` while work exists, and parks on an event
when idle (no busy-wait, no lock contention on the device loop). Handlers
communicate per-request through ``queue.Queue`` fed by the engine's
``on_token`` / ``on_finish`` callbacks, which fire on the dispatch thread.

No third-party dependencies: ``http.server.ThreadingHTTPServer`` carries
the sockets, so the front-end runs in any environment the library does.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from multimodal_tpu.serving.engine import InferenceEngine, Request


class EngineDispatcher:
    """Single-owner thread around an ``InferenceEngine``.

    ``submit_request`` is thread-safe and returns a ``queue.Queue``
    carrying ``("token", id)`` events and a final ``("done", output)`` /
    ``("error", message)``.
    """

    def __init__(self, engine: InferenceEngine):
        self.engine = engine
        self._pending: "queue.Queue" = queue.Queue()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._dead: str = ""  # non-empty = dispatch thread died with this
        self._inflight: dict = {}  # id(request) -> events queue
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit_request(self, request: Request) -> "queue.Queue":
        events: "queue.Queue" = queue.Queue()
        if self._dead:
            events.put(("error", f"engine unavailable: {self._dead}"))
            return events
        request.on_token = lambda t: events.put(("token", t))

        def finish(out, _req=request, _ev=events):
            self._inflight.pop(id(_req), None)
            _ev.put(("done", out))

        request.on_finish = finish
        self._inflight[id(request)] = events
        self._pending.put((request, events))
        self._wake.set()
        return events

    def cancel_request(self, request: Request) -> None:
        """Client went away: stop generating for this request."""
        self.engine.cancel(request)
        self._wake.set()

    def stats(self) -> dict:
        return self.engine.stats()

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------- internal
    def _drain_pending(self) -> None:
        while True:
            try:
                request, events = self._pending.get_nowait()
            except queue.Empty:
                return
            try:
                self.engine.submit(request)
            except Exception as e:  # bad prompt length / unknown adapter...
                self._inflight.pop(id(request), None)
                events.put(("error", str(e)))

    def _loop(self) -> None:
        try:
            while not self._stop.is_set():
                self._drain_pending()
                busy = self.engine._queue or any(
                    not s.free for s in self.engine._slots
                )
                if busy:
                    self.engine.step()
                    self._drain_pending()
                else:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
        except Exception as e:  # engine died: fail every waiter loudly
            self._dead = f"{type(e).__name__}: {e}"
            for events in list(self._inflight.values()):
                events.put(("error", self._dead))
            self._inflight.clear()
            while True:
                try:
                    _req, events = self._pending.get_nowait()
                except queue.Empty:
                    break
                events.put(("error", self._dead))


def _make_handler(dispatcher: EngineDispatcher):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args: Any) -> None:  # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, dispatcher.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self) -> None:
            if self.path != "/generate":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                request = Request(
                    prompt=[int(t) for t in body["prompt"]],
                    max_new_tokens=int(body.get("max_new_tokens", 16)),
                    temperature=float(body.get("temperature", 0.0)),
                    top_k=(
                        int(body["top_k"]) if "top_k" in body else None
                    ),
                    top_p=(
                        float(body["top_p"]) if "top_p" in body else None
                    ),
                    eos_id=(
                        int(body["eos_id"])
                        if body.get("eos_id") is not None else None
                    ),
                    prefix=body.get("prefix"),
                    adapter=body.get("adapter"),
                    request_id=body.get("request_id"),
                )
            except (KeyError, TypeError, ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            stream = bool(body.get("stream", False))
            events = dispatcher.submit_request(request)
            try:
                if stream:
                    self._stream(events)
                else:
                    self._blocking(events)
            except (BrokenPipeError, ConnectionResetError):
                # client disconnected mid-generation: free the slot
                dispatcher.cancel_request(request)

        def _blocking(self, events: "queue.Queue") -> None:
            tokens = []
            while True:
                kind, payload = events.get()
                if kind == "token":
                    tokens.append(payload)
                elif kind == "error":
                    self._json(400, {"error": payload})
                    return
                else:  # done
                    out = payload
                    self._json(200, {
                        "tokens": out.tokens,
                        "finish_reason": out.finish_reason,
                        "queue_time": out.queue_time,
                        "prefill_time": out.prefill_time,
                        "decode_time": out.decode_time,
                    })
                    return

        def _stream(self, events: "queue.Queue") -> None:
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            # SSE has no fixed length; close delimits the stream
            self.send_header("Connection", "close")
            self.end_headers()
            while True:
                kind, payload = events.get()
                if kind == "token":
                    line = json.dumps({"token": payload})
                elif kind == "error":
                    line = json.dumps({"error": payload})
                else:
                    out = payload
                    line = json.dumps({
                        "done": True,
                        "finish_reason": out.finish_reason,
                        "n_tokens": len(out.tokens),
                    })
                self.wfile.write(f"data: {line}\n\n".encode())
                self.wfile.flush()
                if kind != "token":
                    return

    return Handler


class ServingFrontend:
    """HTTP server + engine dispatcher; ``with ServingFrontend(engine) as
    url:`` serves on an ephemeral localhost port."""

    def __init__(
        self, engine: InferenceEngine, host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.dispatcher = EngineDispatcher(engine)
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.dispatcher)
        )
        self._server_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._server_thread.start()
        self.url = f"http://{host}:{self.httpd.server_address[1]}"

    def __enter__(self) -> str:
        return self.url

    def __exit__(self, *exc: Any) -> None:
        self.close()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.dispatcher.shutdown()
