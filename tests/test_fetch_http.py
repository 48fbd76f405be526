"""HttpClient over a real local HTTP server: whole fetches, range fetches,
and a model load through the HTTP path.

Plays the role the reference's SimpleHttpClient (src/lib.rs:566-606) and
its per-mip HTTP range requests (textures.rs:616-926) play: the asset
pipeline must work against a byte server, not just the filesystem.
"""

import http.server
import threading

import numpy as np
import pytest

from superconductor_tpu.assets.fetch import HttpClient

from conftest import make_box_glb


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_assets")
    (root / "box.glb").write_bytes(make_box_glb())
    payload = bytes(range(256)) * 64
    (root / "blob.bin").write_bytes(payload)

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    # SimpleHTTPRequestHandler has no Range support; KTX2 streaming needs
    # real 206 responses, so implement the subset the client sends.
    class RangeHandler(Handler):
        def send_head(self):
            rng = self.headers.get("Range")
            if rng is None:
                return super().send_head()
            path = self.translate_path(self.path)
            try:
                data = open(path, "rb").read()
            except OSError:
                self.send_error(404)
                return None
            start, end = rng.split("=")[1].split("-")
            start, end = int(start), int(end) + 1
            chunk = data[start:end]
            self.send_response(206)
            self.send_header("Content-Length", str(len(chunk)))
            self.send_header(
                "Content-Range", f"bytes {start}-{end - 1}/{len(data)}"
            )
            self.end_headers()
            import io

            return io.BytesIO(chunk)

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", payload
    server.shutdown()


def test_http_fetch_bytes(http_root):
    base, payload = http_root
    client = HttpClient()
    assert client.fetch_bytes(f"{base}/blob.bin") == payload


def test_http_fetch_range(http_root):
    base, payload = http_root
    client = HttpClient()
    for start, end in [(0, 10), (1000, 1024), (16000, 16384), (5, 6)]:
        got = client.fetch_bytes_range(f"{base}/blob.bin", start, end)
        assert got == payload[start:end], (start, end)


def test_http_model_load(http_root):
    base, _ = http_root
    import superconductor_tpu as sc
    from superconductor_tpu.assets.models import load_model

    client = HttpClient()
    scene = sc.Scene()
    model = load_model(scene, client.fetch_bytes(f"{base}/box.glb"), name="box")
    assert len(model.primitives) == 1
    assert model.primitives[0].lods[0].index_count == 36


def test_http_resolve_relative(http_root):
    base, _ = http_root
    client = HttpClient()
    assert (
        client.resolve(f"{base}/models/scene.gltf", "scene.bin")
        == f"{base}/models/scene.bin"
    )
