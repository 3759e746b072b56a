"""HTTP microservice base (aiohttp).

Service-mesh layer parity with the reference's Gradio/FastAPI stack
(reference: webapp/webapps/gradio_webapp.py — Gradio Blocks on FastAPI via
uvicorn). Neither gradio nor fastapi is available here; services are plain
aiohttp apps exposing JSON endpoints with base64-encoded arrays/files, which
keeps the same topology (one service per model, HTTP hops between them,
reference SURVEY.md section 3.5) with ~zero dependency surface.

Transport format: JSON objects; ndarray fields are
{"__ndarray__": base64, "dtype": ..., "shape": [...]}; binary file fields
are {"__file__": base64, "name": ...}.
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import threading
from typing import Any, Callable, Dict, Optional

import numpy as np

try:
    from aiohttp import web
except Exception:  # pragma: no cover
    web = None


def encode_payload(obj: Any) -> Any:
    """Recursively encode numpy arrays / bytes for JSON transport."""
    if isinstance(obj, np.ndarray):
        return {"__ndarray__": base64.b64encode(
            np.ascontiguousarray(obj).tobytes()).decode(),
            "dtype": str(obj.dtype), "shape": list(obj.shape)}
    if isinstance(obj, (bytes, bytearray)):
        return {"__file__": base64.b64encode(bytes(obj)).decode()}
    if isinstance(obj, dict):
        return {k: encode_payload(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [encode_payload(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def decode_payload(obj: Any) -> Any:
    if isinstance(obj, dict):
        if "__ndarray__" in obj:
            raw = base64.b64decode(obj["__ndarray__"])
            return np.frombuffer(raw, dtype=np.dtype(obj["dtype"])).reshape(
                obj["shape"]).copy()
        if "__file__" in obj:
            return base64.b64decode(obj["__file__"])
        return {k: decode_payload(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [decode_payload(v) for v in obj]
    return obj


class Webapp:
    """Base microservice: named endpoints served over HTTP.

    Subclasses register handlers with `self.route(name, fn)`; handlers take
    a decoded dict and return an encodable dict. Requests are serialized
    through a lock (model state is single-stream, like Gradio's queue,
    reference: gradio_webapp.py:22).
    """

    def __init__(self, netpath: str = "", port: int = 8888):
        if web is None:
            raise RuntimeError("aiohttp is required for the service layer")
        self.netpath = netpath.rstrip("/")
        self.port = port
        self._routes: Dict[str, Callable] = {}
        self._lock = threading.Lock()
        self.route("health", lambda req: {"status": "ok",
                                          "service": type(self).__name__})

    def route(self, name: str, fn: Callable[[dict], dict]) -> None:
        self._routes[name] = fn

    def _make_app(self):
        app = web.Application(client_max_size=1 << 30)

        def make_handler(fn):
            async def handler(request: "web.Request"):
                try:
                    body = await request.read()
                    payload = decode_payload(json.loads(body) if body
                                             else {})
                    loop = asyncio.get_event_loop()

                    def call():
                        with self._lock:
                            return fn(payload)

                    result = await loop.run_in_executor(None, call)
                    return web.json_response(encode_payload(
                        {"ok": True, "data": result}))
                except Exception as exc:  # noqa: BLE001
                    import sys
                    import traceback
                    # mirror to the server log — the JSON body reaches the
                    # client, but operators read the process output
                    print(f"[{type(self).__name__}] handler error: {exc}",
                          file=sys.stderr, flush=True)
                    traceback.print_exc()
                    return web.json_response(
                        {"ok": False, "error": str(exc),
                         "traceback": traceback.format_exc()}, status=500)
            return handler

        for name, fn in self._routes.items():
            app.router.add_post(f"{self.netpath}/{name}", make_handler(fn))

        # GET /health for load balancers / k8s readiness probes (the POST
        # route stays the client protocol)
        async def health_get(request):
            return web.json_response({"ok": True, "data": {
                "status": "ok", "service": type(self).__name__}})
        app.router.add_get(f"{self.netpath}/health", health_get)

        if getattr(self, "index_html", None):
            async def index(request):
                return web.Response(text=self.index_html,
                                    content_type="text/html")
            app.router.add_get(f"{self.netpath}/", index)
            if self.netpath:
                app.router.add_get(self.netpath, index)
        return app

    def run(self) -> None:
        """Serve forever (blocking)."""
        web.run_app(self._make_app(), port=self.port, print=None)

    def start_background(self):
        """Serve on a daemon thread; returns the thread (for tests)."""
        import threading as th

        started = th.Event()
        runner_box = {}

        def serve():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            runner = web.AppRunner(self._make_app())
            loop.run_until_complete(runner.setup())
            site = web.TCPSite(runner, "127.0.0.1", self.port)
            loop.run_until_complete(site.start())
            runner_box["runner"] = runner
            runner_box["loop"] = loop
            started.set()
            loop.run_forever()

        t = th.Thread(target=serve, daemon=True)
        t.start()
        started.wait(timeout=10)
        return t
