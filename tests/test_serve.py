"""Inference-server tests: micro-batching correctness and the HTTP API.

Tiny config so the sampler compiles in seconds on CPU; the HTTP test runs
a real ThreadingHTTPServer on an ephemeral port.
"""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the default smoke tier

from gif_tpu.train import get_config, create_train_state
from gif_tpu.flame.resources import synthetic_flame_resources
from gif_tpu.serve import GifServer, make_handler


@pytest.fixture(scope="module")
def server():
    cfg = get_config(
        8,
        embedding_vocab_size=16,
        batch_size=4,
        init_size=32,
        max_size=32,
        render_image_size=32,
        max_channels=32,
        nmlp_for_z_to_w=2,
        compute_dtype="float32",
    )
    res = synthetic_flame_resources(seed=1, n_vertices=503)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    srv = GifServer(
        cfg, res, state.g_params, state.buffers, batch_size=4, max_wait_ms=30
    )
    yield srv
    srv.stop()


def test_generate_and_microbatching(server):
    imgs = [None] * 3

    def worker(i):
        imgs[i] = server.generate(None, identity=i, seed=i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for img in imgs:
        assert img is not None and img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert server.requests_served >= 3


def test_generate_rejects_bad_flame(server):
    with pytest.raises(ValueError, match="236"):
        server.generate(np.zeros(7), identity=0)


def test_http_api(server):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"identity": 1, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        httpd.shutdown()
