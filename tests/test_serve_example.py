"""HTTP layer of the serving example (no weights needed)."""

import base64
import http.client
import json
import sys
import threading
from http.server import ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))

from serve_txt2img import _Job, _make_handler  # noqa: E402


class _FakeEngine:
    """Resolves every job with a 1-byte 'image' without touching a model."""

    def submit(self, job: _Job) -> None:
        if job.prompt == "boom":
            job.error = "ValueError: boom"
        else:
            job.image_png = b"\x89PNG-fake"
        job.done.set()


def _request(port: int, method: str, path: str, body: dict | None = None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request(method, path, json.dumps(body) if body is not None else None)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_serve_http_layer() -> None:
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(_FakeEngine()))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        status, data = _request(port, "GET", "/healthz")
        assert (status, data) == (200, b"ok")

        status, data = _request(port, "POST", "/generate", {"prompt": "a cat", "seed": 3})
        assert status == 200
        assert base64.b64decode(json.loads(data)["image_base64"]) == b"\x89PNG-fake"

        status, _ = _request(port, "POST", "/generate", {"negative_prompt": "no prompt key"})
        assert status == 400

        status, data = _request(port, "POST", "/generate", {"prompt": "boom"})
        assert status == 500
        assert "boom" in json.loads(data)["error"]

        status, _ = _request(port, "GET", "/nope")
        assert status == 404
    finally:
        server.shutdown()
