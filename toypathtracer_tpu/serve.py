"""Live progressive viewer: the interactive-frontend layer.

TPU-native equivalent of the reference's three interactive frontends --
the Win32/D3D11 app (reference: Cpp/Windows/TestWin.cpp:384-432), the
MetalKit app (Cpp/Apple/Renderer.mm:272-316), and most directly the
Emscripten/HTML one (Cpp/Emscripten/toypathtracer.html:96-128: a JS
requestAnimationFrame loop pulling frames from the render core, checkboxes
for the animate/progressive flags, a Mray/s HUD line).

Here the "window" is a browser tab served by a stdlib HTTP server:

  * a background thread runs the progressive RenderSession continuously
    (device-bound; the GIL is released inside XLA execution);
  * `GET /frame.png` returns the latest accumulated frame (exact-sRGB
    encoded, the blit path of PixelShader.hlsl:1-15);
  * `GET /stats` returns the HUD fields in the reference's exact format
    (TestWin.cpp:330);
  * `GET /set?animate=0|1&progressive=0|1` toggles the runtime flags --
    and, as in every reference frontend, any toggle resets progressive
    accumulation (TestWin.cpp:424-431);
  * `GET /set?backend=<name>` switches the renderer at runtime (key 'g'
    in the page) -- the analog of the reference's per-frame GPU/CPU flip
    (TestWin.cpp:419-423: key 'g' flips gUseGPU and resets frameCount);
    here the roles are pallas (GPU analog) vs jnp (portable analog);
  * animation time advances with the wall clock, scaled by 0.2 like the
    web frontend (Cpp/Emscripten/main.cpp:57).

Usage:
    python -m toypathtracer_tpu.serve [--port 8000] [--width 1280 ...]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from . import io as image_io
from .config import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from .profiling import FrameTimer
from .render.frame import RenderSession, init_frame_state, sum_rays
from .scene import make_scene

_PAGE = """<!DOCTYPE html>
<html><head><title>toypathtracer_tpu</title><style>
body {{ background: #222; color: #ddd; font: 13px monospace; margin: 1em; }}
img {{ image-rendering: pixelated; border: 1px solid #444; max-width: 100%; }}
label {{ margin-right: 1.5em; }}
#hud {{ margin: .6em 0; white-space: pre; }}
</style></head><body>
<div>
  <label><input type="checkbox" id="animate"> animate (a)</label>
  <label><input type="checkbox" id="progressive" checked> progressive (p)</label>
  <label id="backendlabel" style="display:none">
    backend (g): <span id="backend">?</span></label>
</div>
<div id="hud">starting...</div>
<img id="frame" width="{width}" alt="render">
<script>
const img = document.getElementById('frame');
const hud = document.getElementById('hud');
function setFlags() {{
  fetch('/set?animate=' + (animate.checked ? 1 : 0) +
        '&progressive=' + (progressive.checked ? 1 : 0));
}}
animate.onchange = setFlags; progressive.onchange = setFlags;
let backends = [], curBackend = '';
document.addEventListener('keydown', e => {{
  if (e.key === 'a') {{ animate.checked = !animate.checked; setFlags(); }}
  if (e.key === 'p') {{ progressive.checked = !progressive.checked; setFlags(); }}
  if (e.key === 'g' && backends.length > 1) {{
    const next = backends[(backends.indexOf(curBackend) + 1) % backends.length];
    fetch('/set?backend=' + next);
  }}
}});
function step() {{
  const next = new Image();
  next.onload = () => {{ img.src = next.src; requestAnimationFrame(step); }};
  next.onerror = () => setTimeout(step, 250);
  next.src = '/frame.png?t=' + Date.now();
}}
setInterval(() => fetch('/stats').then(r => r.json())
  .then(s => {{
    hud.textContent = s.hud;
    backends = s.backends; curBackend = s.backend;
    document.getElementById('backend').textContent = s.backend;
    document.getElementById('backendlabel').style.display =
      backends.length > 1 ? 'inline' : 'none';
  }}).catch(() => {{}}), 500);
step();
</script></body></html>
"""


class Viewer:
    """Owns the render loop; thread-safe snapshot of (png, hud) for the
    HTTP handlers.  Flag toggles are applied between frames by the render
    thread itself (RenderSession is single-threaded by design)."""

    def __init__(self, scene, cfg: RenderConfig,
                 flags: int = FLAG_PROGRESSIVE, render_fn=None,
                 time_scale: float = 0.2, render_fns=None,
                 backend: str | None = None, batch: int = 1):
        # render_fns: {name: render_fn or None (= default jnp wavefront)}.
        # More than one entry enables the runtime backend switch (the
        # reference's 'g' key, TestWin.cpp:419-423).  The plain render_fn
        # kwarg remains as the single-backend shorthand.
        if render_fns is None:
            render_fns = {"default": render_fn}
        self.render_fns = render_fns
        self.backend = backend if backend is not None \
            else next(iter(render_fns))
        if self.backend not in render_fns:
            raise ValueError(f"backend {self.backend!r} not in "
                             f"{sorted(render_fns)}")
        self.sess = RenderSession(scene, cfg, flags=flags,
                                  render_fn=render_fns[self.backend])
        self.cfg = cfg
        self.time_scale = time_scale
        # Frames fused per device dispatch while converging a STATIC view
        # (render.frame.progressive_steps): each dispatch carries a fixed
        # ~250-390 ms tunnel floor (docs/measured/bench_frames_r4.json),
        # so batching multiplies the convergence rate the viewer actually
        # delivers.  Animation always steps one frame at a time (it needs
        # per-frame wall-clock time and a damped trail, not a mean).
        self.batch = max(1, int(batch))
        self.timer = FrameTimer(window=10)
        self._lock = threading.Lock()
        self._pending_flags: int | None = None
        self._pending_backend: str | None = None
        self._png = image_io.png_bytes(
            np.zeros((cfg.height, cfg.width, 3), np.float32))
        self._hud = "starting..."
        self._stop = threading.Event()
        self._t0 = time.perf_counter()
        self._thread: threading.Thread | None = None

    # -- control (any thread) ------------------------------------------
    def set_flags(self, animate: bool, progressive: bool) -> None:
        flags = (FLAG_ANIMATE if animate else 0) | \
                (FLAG_PROGRESSIVE if progressive else 0)
        with self._lock:
            self._pending_flags = flags

    def set_backend(self, name: str) -> bool:
        """Request a renderer switch (applied by the render thread between
        frames; resets progressive accumulation, TestWin.cpp:419-423).
        Returns False for unknown names."""
        if name not in self.render_fns:
            return False
        with self._lock:
            self._pending_backend = name
        return True

    def snapshot(self):
        with self._lock:
            return self._png, self._hud

    @property
    def flags(self) -> int:
        with self._lock:
            pending = self._pending_flags
        return self.sess.flags if pending is None else pending

    # -- render loop (render thread) -----------------------------------
    def step_once(self) -> None:
        with self._lock:
            pending, self._pending_flags = self._pending_flags, None
            pending_b, self._pending_backend = self._pending_backend, None
        if pending is not None and pending != self.sess.flags:
            self.sess.set_flags(pending)  # resets accumulation
            self.timer = FrameTimer(window=10)
        if pending_b is not None and pending_b != self.backend:
            self.backend = pending_b
            self.sess.render_fn = self.render_fns[pending_b]
            self.sess.state = init_frame_state(self.cfg)  # reset accum
            self.timer = FrameTimer(window=10)
        t = (time.perf_counter() - self._t0) * self.time_scale
        # Batch only while accumulating a static view: with PROGRESSIVE
        # off each fused frame would overwrite the accumulator (n-1 of n
        # wasted), and ANIMATE needs per-frame wall-clock time.
        flags_now = self.sess.flags
        n = self.batch if (flags_now & FLAG_PROGRESSIVE
                           and not flags_now & FLAG_ANIMATE) else 1
        t0 = time.perf_counter()
        img, raycount = self.sess.steps(time=t, n=n)
        img_h = np.asarray(img)          # host transfer = device sync
        rays = sum_rays(raycount)        # per-frame for n > 1; int64 sum
        self.timer.add(time.perf_counter() - t0, rays, count=n)
        png = image_io.png_bytes(img_h)
        with self._lock:
            self._png = png
            self._hud = self.timer.hud()

    def run(self) -> None:
        while not self._stop.is_set():
            self.step_once()

    def start(self) -> None:
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)


def make_handler(viewer: Viewer):
    page = _PAGE.format(width=viewer.cfg.width).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, ctype: str, body: bytes) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path in ("/", "/index.html"):
                self._send(200, "text/html", page)
            elif url.path == "/frame.png":
                png, _ = viewer.snapshot()
                self._send(200, "image/png", png)
            elif url.path == "/stats":
                _, hud = viewer.snapshot()
                flags = viewer.flags
                body = json.dumps({
                    "hud": hud,
                    "mray_s": viewer.timer.mray_s(),
                    "frames": int(np.asarray(viewer.sess.state.frame)),
                    "animate": bool(flags & FLAG_ANIMATE),
                    "progressive": bool(flags & FLAG_PROGRESSIVE),
                    "backend": viewer.backend,
                    "backends": sorted(viewer.render_fns),
                }).encode()
                self._send(200, "application/json", body)
            elif url.path == "/set":
                q = parse_qs(url.query)
                ok = True
                if "backend" in q:
                    ok = viewer.set_backend(q["backend"][0])
                if "animate" in q or "progressive" in q:
                    viewer.set_flags(
                        animate=q.get("animate", ["0"])[0] == "1",
                        progressive=q.get("progressive", ["1"])[0] == "1")
                body = b'{"ok": true}' if ok else b'{"ok": false}'
                self._send(200 if ok else 400, "application/json", body)
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def main(argv=None) -> int:
    from .cli import _enable_compile_cache, _pick_backend

    ap = argparse.ArgumentParser(
        prog="toypathtracer_tpu.serve",
        description="live progressive viewer (browser frontend)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--scaled", type=int, default=0, metavar="N",
                    help="view the procedurally instanced N-sphere scene "
                         "(chunked traversal; backend toggle = scaled "
                         "jnp/pallas kernels)")
    ap.add_argument("--animate", action="store_true")
    ap.add_argument("--ppl", type=int, default=1, metavar="K",
                    help="pixels per lane in the Pallas wavefront")
    ap.add_argument("--batch", type=int, default=0, metavar="N",
                    help="frames fused per device dispatch while the view "
                         "is static (0 = auto: 8 on TPU, 1 elsewhere).  "
                         "Each dispatch pays a fixed ~0.3 s tunnel floor, "
                         "so batching multiplies the delivered progressive "
                         "convergence rate; animation always steps 1.")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "jnp", "parity", "sharded"])
    args = ap.parse_args(argv)

    _enable_compile_cache()
    import jax
    on_tpu = jax.devices()[0].platform == "tpu"
    # cap 64 as dispatch-latency policy: one fused dispatch blocks flag
    # toggles / HUD updates for its whole duration (ray counting itself
    # is exact at any n -- per-frame counts, host int64 sum)
    batch = min(args.batch if args.batch > 0 else (8 if on_tpu else 1), 64)
    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, max_depth=args.max_depth,
                       pix_per_lane=args.ppl)
    flags = FLAG_PROGRESSIVE | (FLAG_ANIMATE if args.animate else 0)
    if args.scaled:
        from functools import partial
        from .scaled import make_scaled_scene, render_frame_scaled
        # --animate works: ScaledScene.animate orbits the emissive
        # beacons (functional chunk-AABB refresh, scaled.py)
        scene = make_scaled_scene(n=args.scaled)
        render_fns = {"jnp": partial(render_frame_scaled, pallas=False)}
        if on_tpu:
            render_fns["pallas"] = partial(render_frame_scaled, pallas=True)
        backend_name = "pallas" if on_tpu else "jnp"
        viewer = Viewer(scene, cfg, flags=flags, render_fns=render_fns,
                        backend=backend_name, batch=batch)
        backend_name = f"scaled-{backend_name} ({args.scaled} spheres)"
    else:
        scene = make_scene(big=not args.small)
        render_fn, backend_name = _pick_backend(args.backend)
        # jnp <-> pallas are runtime-switchable (key 'g'); the other
        # backends stay fixed at what --backend selected.
        if backend_name in ("jnp", "pallas") and on_tpu:
            from .ops.pallas_render import render_frame_pallas
            render_fns = {"jnp": None, "pallas": render_frame_pallas}
            viewer = Viewer(scene, cfg, flags=flags, render_fns=render_fns,
                            backend=backend_name, batch=batch)
        else:
            viewer = Viewer(scene, cfg, flags=flags, render_fn=render_fn,
                            batch=batch)
    viewer.start()

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(viewer))
    print(f"serving backend={backend_name} at "
          f"http://{args.host}:{server.server_address[1]}/  (Ctrl-C stops)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        viewer.stop()
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
