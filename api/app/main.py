"""Inference HTTP service.

Analog of api/app/main.py:15-48 — routes ``GET /status`` and ``POST /classification``
plus an ``X-Process-Time`` header. Built on the stdlib HTTP server so it runs in
dependency-free environments; when FastAPI/uvicorn are installed,
``create_fastapi_app()`` exposes the same routes as an ASGI app.
"""

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import config
from .routes import classification
from .schemas import Status


class Handler(BaseHTTPRequestHandler):
    # HTTP/1.1 keep-alive: every response carries Content-Length, so persistent
    # connections are safe — without this the default HTTP/1.0 closes the socket
    # after each response and concurrent clients pay a reconnect (and racing
    # reuse attempts surface as ECONNRESET under load)
    protocol_version = "HTTP/1.1"
    # keep-alive + Nagle is a latency trap: the response goes out in two writes
    # (headers, body), and Nagle holds the second until the first is ACKed — a
    # ~40 ms delayed-ACK stall per request on persistent connections. This is a
    # socketserver HANDLER attribute (applied in StreamRequestHandler.setup).
    disable_nagle_algorithm = True
    def _send(self, code: int, payload: dict, t0: float, timings: dict = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Process-Time", str(time.time() - t0))
        # per-stage attribution (decode / queue-wait / device call / batch size):
        # the reference reports only the total; these headers localize the host cost
        for key, value in (timings or {}).items():
            self.send_header(f"X-{key.replace('_', '-').title()}", f"{value:.3f}")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        t0 = time.time()
        if self.path == "/status":
            payload = Status(status="ok", project=config.PROJECT_NAME, version=config.VERSION)
            self._send(200, payload.model_dump(), t0)
        else:
            self._send(404, {"detail": "Not Found"}, t0)

    def do_POST(self):  # noqa: N802
        t0 = time.time()
        # drain the body before ANY response: under keep-alive an unread body
        # would be parsed as the next request line, desyncing the connection
        length = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(length)
        if self.path != "/classification":
            self._send(404, {"detail": "Not Found"}, t0)
            return
        # accept either a raw image body or multipart (extract the first file part)
        content_type = self.headers.get("Content-Type", "")
        if content_type.startswith("multipart/form-data"):
            boundary = content_type.split("boundary=")[-1].encode()
            parts = data.split(b"--" + boundary)
            data = b""
            for part in parts:
                if b"\r\n\r\n" in part and b"filename=" in part:
                    data = part.split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n")
                    break
        if not data:
            self._send(422, {"detail": "no image payload"}, t0)
            return
        timings: dict = {}
        try:
            candidate = classification.classify(data, timings)
        except Exception as e:  # decoding / inference failure
            self._send(400, {"detail": f"invalid image: {e}"}, t0)
            return
        self._send(200, candidate.model_dump(), t0, timings)

    def log_message(self, fmt, *log_args):  # quiet
        pass


class _Server(ThreadingHTTPServer):
    # a burst of simultaneous new connections (load spikes; the concurrency bench's
    # barrier start) overflows the default listen backlog of 5 and the kernel RSTs
    # the excess — size it for the batcher's design load instead
    request_queue_size = 128
    # daemon_threads is already True on ThreadingHTTPServer (stdlib default)


def serve(host: str = config.HOST, port: int = config.PORT) -> ThreadingHTTPServer:
    server = _Server((host, port), Handler)
    return server


def create_fastapi_app():
    """Optional FastAPI app with the same surface (requires fastapi installed)."""
    import time as _time

    from fastapi import FastAPI, File, HTTPException, UploadFile

    from .schemas import ClsCandidate

    app = FastAPI(title=config.PROJECT_NAME, description=config.PROJECT_DESCRIPTION, version=config.VERSION)

    @app.get("/status", response_model=Status)
    def status():
        return Status(status="ok", project=config.PROJECT_NAME, version=config.VERSION)

    @app.post("/classification", response_model=ClsCandidate)
    async def classify(file: UploadFile = File(...)):
        from fastapi import Response

        try:
            timings: dict = {}
            candidate = classification.classify(await file.read(), timings)
            resp = Response(content=candidate.model_dump_json(), media_type="application/json")
            for key, value in timings.items():
                resp.headers[f"X-{key.replace('_', '-').title()}"] = f"{value:.3f}"
            return resp
        except Exception as e:
            raise HTTPException(status_code=400, detail=f"invalid image: {e}") from e

    @app.middleware("http")
    async def add_process_time(request, call_next):
        t0 = _time.time()
        response = await call_next(request)
        response.headers["X-Process-Time"] = str(_time.time() - t0)
        return response

    return app


if __name__ == "__main__":
    print(f"Serving {config.PROJECT_NAME} on {config.HOST}:{config.PORT}")
    serve().serve_forever()
