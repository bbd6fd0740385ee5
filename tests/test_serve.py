"""Demo server: health, index, QA and segment endpoints with stub models."""
import json
import urllib.request

import numpy as np
import pytest


class StubChat:
    def answer(self, question, video_frames=None, images=None,
               suppress_ids=()):
        return f"answer to: {question} ({len(video_frames or [])} frames)"


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
