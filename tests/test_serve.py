"""Demo server: health, index, QA and segment endpoints with stub models."""
import json
import urllib.request

import numpy as np
import pytest


class StubChat:
    def answer(self, question, video_frames=None, images=None,
               suppress_ids=()):
        # report which frame positions are solid-color (a drawn overlay
        # frame in the tests) so the overlay routing is observable
        solid = [
            i for i, f in enumerate(video_frames or [])
            if np.ptp(f) == 0
        ]
        return (
            f"answer to: {question} ({len(video_frames or [])} frames, "
            f"solid={solid})"
        )


class StubSegmentor:
    def segment_video(self, frames, expression):
        t = len(frames)
        h, w = frames[0].shape[:2]
        m = np.zeros((t, h, w), bool)
        m[:, h // 4 : h // 2, w // 4 : w // 2] = True
        return m


@pytest.fixture(scope="module")
def server():
    from rga3_tpu.serve.app import UniGRService, serve

    svc = UniGRService(chat=StubChat(), segmentor=StubSegmentor())
    httpd = serve(svc, port=7877, background=True)
    yield "http://127.0.0.1:7877"
    httpd.shutdown()


def _make_video(path, t=4, size=48):
    import cv2

    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (size, size)
    )
    rng = np.random.default_rng(0)
    for _ in range(t):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()


def _post_multipart(url, fields, files):
    boundary = "testboundary123"
    body = b""
    for k, v in fields.items():
        body += (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{k}"\r\n\r\n{v}\r\n'
        ).encode()
    for k, (fname, data) in files.items():
        body += (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{k}"; filename="{fname}"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + data + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url, data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        },
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health_and_index(server):
    with urllib.request.urlopen(server + "/health", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        assert b"UniGR" in r.read()


def test_qa_endpoint(server, tmp_path):
    vp = str(tmp_path / "v.mp4")
    _make_video(vp)
    with open(vp, "rb") as f:
        data = f.read()
    status, out = _post_multipart(
        server + "/api/qa", {"question": "what moves?"},
        {"video": ("v.mp4", data)},
    )
    assert status == 200
    assert "what moves?" in out["answer"]


def test_qa_endpoint_with_drawn_overlay(server, tmp_path):
    """A canvas-drawn frame posted as `overlay` replaces the sampled frame
    at its `overlay_frac` position (ref app.py:581-596 ImageEditor flow)."""
    import cv2

    vp = str(tmp_path / "v.mp4")
    _make_video(vp)
    with open(vp, "rb") as f:
        data = f.read()
    solid = np.full((48, 48, 3), 200, np.uint8)
    ok, png = cv2.imencode(".png", solid)
    assert ok
    status, out = _post_multipart(
        server + "/api/qa",
        {"question": "circled object?", "overlay_frac": "1.0"},
        {"video": ("v.mp4", data), "overlay": ("overlay.png", png.tobytes())},
    )
    assert status == 200
    # the last sampled frame (frac=1.0) must be the solid drawn frame
    n = int(out["answer"].split("(")[1].split(" ")[0])
    assert f"solid=[{n - 1}]" in out["answer"]


def test_segment_endpoint(server, tmp_path):
    from rga3_tpu.utils import rle

    vp = str(tmp_path / "v.mp4")
    _make_video(vp)
    with open(vp, "rb") as f:
        data = f.read()
    status, out = _post_multipart(
        server + "/api/segment", {"expression": "the square"},
        {"video": ("v.mp4", data)},
    )
    assert status == 200
    assert out["num_frames"] >= 1
    m = rle.decode(out["masks"][0])
    assert m.sum() > 0


def test_qa_batcher_coalesces_concurrent_requests():
    """Concurrent qa() calls ride ONE answer_batch call (micro-batched
    serving); stragglers and singletons still answer correctly."""
    import threading
    import time

    from rga3_tpu.serve.app import QABatcher

    class BatchChat:
        def __init__(self):
            self.batch_calls = []
            self.single_calls = 0

        def answer(self, q, video_frames=None, **kw):
            self.single_calls += 1
            return f"single:{q}"

        def answer_batch(self, questions, video_frames_list=None, **kw):
            self.batch_calls.append(len(questions))
            time.sleep(0.01)
            return [f"batched:{q}" for q in questions]

    chat = BatchChat()
    b = QABatcher(chat, max_batch=4, window_ms=80)
    results = {}

    def ask(i):
        results[i] = b.answer(f"q{i}", [np.zeros((4, 4, 3), np.uint8)])

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert results == {i: f"batched:q{i}" for i in range(3)}
    assert chat.batch_calls == [3]
    # a lone request takes the single-sample path
    assert b.answer("solo", []) == "single:solo"
    assert chat.single_calls == 1


def test_qa_batcher_propagates_errors():
    from rga3_tpu.serve.app import QABatcher

    class Boom:
        def answer(self, *a, **k):
            raise RuntimeError("model exploded")

        def answer_batch(self, *a, **k):
            raise RuntimeError("model exploded")

    b = QABatcher(Boom(), max_batch=2, window_ms=10)
    with pytest.raises(RuntimeError, match="model exploded"):
        b.answer("q", [])
