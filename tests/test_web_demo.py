"""Tests for the browser demo server (apps/web_demo.py).

The reference's browser deliverable is the WASM AudioWorklet birds demo
(docs/js/birds-worklet-processor.js, source/unity.build.birds.lib.cpp:47-240).
These tests drive our HTTP analog end-to-end with an injected Birds-shaped
stub (the real engine's render path is covered by tests/test_soundengine*.py);
a final test serves one chunk from the REAL Birds facade wired to a canned
buffer so the handler sees the production array shapes.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from cpp_audio_tpu.apps import web_demo


class StubEngine:
    """Birds-shaped engine (embind surface, unity.build.birds.lib.cpp:47-240)."""

    sample_rate = 8000
    mode = "birds"

    def __init__(self):
        self.program = 0
        self.cursor = 0

    def max_count_programs(self):
        return 3

    def use_program(self, i):
        self.program = i % 3
        self.cursor = 0

    def process(self, n):
        t = (self.cursor + np.arange(n)) / self.sample_rate
        self.cursor += n
        mono = 0.5 * np.sin(2 * np.pi * (220.0 * (1 + self.program)) * t)
        return np.stack([mono, 0.25 * mono], axis=1).astype(np.float32)


@pytest.fixture()
def demo_server():
    httpd = web_demo.make_server(StubEngine(), port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, httpd
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def test_static_assets(demo_server):
    base, _ = demo_server
    st, body = _get(base + "/")
    assert st == 200 and b"birds-stream-processor" in body
    st, body = _get(base + "/birds-worklet-processor.js")
    assert st == 200 and b"registerProcessor" in body
    # 128-frame quantum contract stated in the worklet
    assert b"128" in body


def test_info_and_chunk_roundtrip(demo_server):
    base, _ = demo_server
    st, body = _get(base + "/api/info")
    info = json.loads(body)
    assert st == 200
    assert info["sample_rate"] == 8000
    assert len(info["programs"]) == 3

    st, body = _get(base + "/api/chunk?n=4096")
    assert st == 200
    pcm = np.frombuffer(body, dtype=np.float32).reshape(-1, 2)
    assert pcm.shape == (4096, 2)
    assert np.isfinite(pcm).all()
    # a 220 Hz sine at amp .5: RMS ~ .35 on the left channel
    rms = float(np.sqrt(np.mean(pcm[:, 0] ** 2)))
    assert 0.2 < rms < 0.5
    # consecutive chunks continue the phase (no restart): first sample of the
    # next chunk equals sin at cursor 4096
    st, body2 = _get(base + "/api/chunk?n=128")
    nxt = np.frombuffer(body2, dtype=np.float32).reshape(-1, 2)
    expect = 0.5 * np.sin(2 * np.pi * 220.0 * (4096 / 8000))
    assert abs(float(nxt[0, 0]) - expect) < 1e-5


def test_program_change(demo_server):
    base, httpd = demo_server
    req = urllib.request.Request(base + "/api/program?i=2", method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
    assert httpd.engine.program == 2
    # chunk now carries the new program's frequency (660 Hz)
    _, body = _get(base + "/api/chunk?n=8000")
    pcm = np.frombuffer(body, dtype=np.float32).reshape(-1, 2)[:, 0]
    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    peak_hz = float(np.argmax(spec))  # 1 Hz bins at n == sample_rate
    assert abs(peak_hz - 660.0) < 2.0


def test_real_birds_facade_shapes(demo_server):
    """Serve a chunk through the REAL Birds class (canned buffer, no jax)."""
    from cpp_audio_tpu.apps.birds_stream import Birds

    eng = Birds.__new__(Birds)  # skip __init__'s lazy-render plumbing
    eng.sample_rate = 8000
    eng.mode = "birds"
    eng.n_channels = 2
    eng.render_seconds = 1.0
    eng._buf = np.ones((8000, 2), dtype=np.float64) * 0.1
    eng._pos = 0
    eng._program = 0
    eng._seed = 1
    eng._alive = True
    base, httpd = demo_server
    with httpd.engine_lock:
        httpd.engine = eng
    _, body = _get(base + "/api/chunk?n=256")
    pcm = np.frombuffer(body, dtype=np.float32).reshape(-1, 2)
    assert pcm.shape == (256, 2)
    np.testing.assert_allclose(pcm, 0.1, rtol=1e-6)
