"""Live-service tests (analog of api/tests/): start the stdlib server in a thread and
hit it with http.client."""

import http.client
import io
import json
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import os

    os.environ["HOLOCRON_ARCH"] = "repvgg_a0"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from api.app.main import serve

    srv = serve("127.0.0.1", 0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield port
    srv.shutdown()


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    process_time = resp.getheader("X-Process-Time")
    conn.close()
    return resp.status, payload, process_time


def test_status(server):
    status, payload, process_time = _request(server, "GET", "/status")
    assert status == 200
    assert payload["status"] == "ok"
    assert process_time is not None


def test_classification(server):
    from PIL import Image

    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    status, payload, _ = _request(
        server, "POST", "/classification", body=buf.getvalue(), headers={"Content-Type": "image/jpeg"}
    )
    assert status == 200
    assert isinstance(payload["value"], str)
    assert 0 <= payload["confidence"] <= 1


def test_classification_bad_payload(server):
    status, payload, _ = _request(server, "POST", "/classification", body=b"not an image")
    assert status == 400
    status, payload, _ = _request(server, "POST", "/classification", body=b"")
    assert status == 422


def test_unknown_route(server):
    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404
