"""Interactive web viewer: orbit camera, progressive rendering, live training.

Replaces the dearpygui GUI (nerf/gui.py / dnerf/gui.py — dearpygui is a
native-window dependency that does not exist headless). Same capabilities,
TPU/server-friendly:

  - orbit / pan / zoom camera (OrbitCamera, core/camera.py = nerf/gui.py:10-53);
  - dynamic resolution targeting a frame budget (ref gui.py:134-140: 200 ms
    budget, downscale floor 1/4);
  - train-while-viewing in fixed-step bursts (ref gui.py:89-111: 16-step
    bursts targeting 500 ms);
  - progressive SPP accumulation when the camera is still (ref gui.py:142-148);
  - a time slider for D-NeRF fields (dnerf/gui.py:289-295).

Zero extra dependencies: stdlib http.server + a canvas page; frames travel as
PNG over XHR.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>focnerf-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px}
canvas{display:block;margin:auto;image-rendering:pixelated}
</style></head><body>
<div id="hud">drag: orbit | wheel: zoom | shift-drag: pan | t: time+ | fps <span id="fps">-</span></div>
<canvas id="c" width="512" height="512"></canvas>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
let theta = 1.2, phi = 0.4, radius = 2.5, cx=0, cy=0, cz=0, t=0.0, busy=false, dirty=true;
let drag=false, panning=false, lx=0, ly=0;
c.onmousedown = e=>{drag=true; panning=e.shiftKey; lx=e.clientX; ly=e.clientY};
window.onmouseup = ()=>drag=false;
window.onmousemove = e=>{ if(!drag) return;
  const dx=e.clientX-lx, dy=e.clientY-ly; lx=e.clientX; ly=e.clientY;
  if(panning){cx -= dx*0.003; cy += dy*0.003;} else {theta -= dx*0.01; phi = Math.min(1.5, Math.max(-1.5, phi + dy*0.01));}
  dirty=true; };
c.onwheel = e=>{ radius *= Math.pow(1.1, e.deltaY>0?1:-1); dirty=true; e.preventDefault(); };
window.onkeydown = e=>{ if(e.key=='t'){ t = (t + 0.05) % 1.0; dirty=true; } };
async function loop(){
  if(busy || !dirty){ requestAnimationFrame(loop); return; }
  busy=true; dirty=false;
  const t0=performance.now();
  const r = await fetch('/render', {method:'POST', body: JSON.stringify({theta,phi,radius,cx,cy,cz,t})});
  const blob = await r.blob();
  const img = await createImageBitmap(blob);
  ctx.imageSmoothingEnabled = false;
  ctx.drawImage(img, 0, 0, c.width, c.height);
  document.getElementById('fps').textContent = (1000/(performance.now()-t0)).toFixed(1);
  busy=false;
  requestAnimationFrame(loop);
}
setInterval(()=>{ fetch('/status').then(r=>r.json()).then(s=>{ if(s.training || s.spp < s.max_spp) dirty=true; }); }, 250);
loop();
</script></body></html>"""


class ViewerState:
    def __init__(
        self, render_fn, W=512, H=512, frame_budget_ms=200.0, train_fn=None, max_spp=16
    ):
        """render_fn(pose [4,4], intrinsics, H, W, time) -> rgb [H, W, 3] float.

        train_fn: optional () -> loss, called in bursts on a worker thread
        (train-while-viewing, ref gui.py:89-111).
        max_spp: accumulation cap for the still-camera progressive pass.
        """
        self.render_fn = render_fn
        self.train_fn = train_fn
        self.W, self.H = W, H
        self.frame_budget_ms = frame_budget_ms
        self.downscale = 4  # start conservative, adapt
        self.training = train_fn is not None
        self.max_spp = max_spp
        # progressive accumulation state (ref gui.py:142-148): while the
        # camera is still, frames rendered with sub-pixel jitter are averaged
        self.spp = 0
        self._accum: Optional[np.ndarray] = None
        self._last_key: Optional[tuple] = None
        self._stop = threading.Event()
        self._loss = float("nan")
        if self.training:
            threading.Thread(target=self._train_loop, daemon=True).start()

    def _train_loop(self):
        while not self._stop.is_set():
            t0 = time.time()
            for _ in range(16):  # 16-step bursts (ref gui.py:89-111)
                self._loss = float(self.train_fn())
            # keep bursts near 500 ms by sleeping if too fast
            dt = time.time() - t0
            if dt < 0.1:
                time.sleep(0.1 - dt)

    def render(self, cam: dict) -> np.ndarray:
        H = max(self.H // self.downscale, self.H // 4)
        W = max(self.W // self.downscale, self.W // 4)
        theta, phi, r = cam["theta"], cam["phi"], cam["radius"]
        center = np.array(
            [r * np.cos(phi) * np.sin(theta), r * np.sin(phi), r * np.cos(phi) * np.cos(theta)],
            np.float32,
        ) + np.array([cam.get("cx", 0), cam.get("cy", 0), cam.get("cz", 0)], np.float32)
        fwd = -center / (np.linalg.norm(center) + 1e-9)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right) + 1e-9
        down = np.cross(fwd, right)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.stack([right, down, fwd], -1)
        pose[:3, 3] = center
        focal = H / (2 * np.tan(np.radians(50) / 2))

        # progressive SPP: identical camera+shape -> keep averaging jittered
        # passes; any change resets the accumulator (ref gui.py:142-148)
        key = (round(theta, 6), round(phi, 6), round(r, 6),
               cam.get("cx", 0), cam.get("cy", 0), cam.get("cz", 0),
               round(cam.get("t", 0.0), 6), H, W, self.training)
        if self.training:
            # params change every burst -> accumulated frames would be stale
            self._last_key = None
        if key != self._last_key or self._accum is None or self._accum.shape[0] != H:
            self._last_key = key
            self._accum = None
            self.spp = 0
        if self.spp >= self.max_spp:
            return np.clip(self._accum, 0, 1)
        # sub-pixel jitter on the principal point: pass 0 is centered so the
        # first frame is clean; later passes average fractional-pixel offsets
        if self.spp == 0:
            jx = jy = 0.0
        else:
            jx, jy = np.random.default_rng(self.spp).uniform(-0.5, 0.5, 2)

        t0 = time.time()
        rgb = np.asarray(
            self.render_fn(
                pose, (focal, focal, W / 2 + jx, H / 2 + jy), H, W, cam.get("t", 0.0)
            )
        ).astype(np.float32)
        dt_ms = (time.time() - t0) * 1000
        self._accum = rgb if self._accum is None else (
            self._accum + (rgb - self._accum) / (self.spp + 1)
        )
        self.spp += 1
        # dynamic resolution targeting the budget (ref gui.py:134-140)
        if dt_ms > self.frame_budget_ms * 1.2 and self.downscale < 4:
            self.downscale += 1
        elif dt_ms < self.frame_budget_ms * 0.5 and self.downscale > 1:
            self.downscale -= 1
        return np.clip(self._accum, 0, 1)

    def stop(self):
        self._stop.set()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/status":
                body = json.dumps(
                    {"training": state.training, "loss": state._loss,
                     "downscale": state.downscale, "spp": state.spp,
                     "max_spp": state.max_spp}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            cam = json.loads(self.rfile.read(n) or b"{}")
            rgb = state.render(cam)
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray((rgb * 255).astype(np.uint8)).save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def run_viewer(state: ViewerState, port: int = 7007):
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"[viewer] http://localhost:{port}")
    try:
        server.serve_forever()
    finally:
        state.stop()
