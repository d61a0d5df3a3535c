"""Live-viewer frontend tests (toypathtracer_tpu/serve.py).

Covers the interactive-frontend contract of the reference (SURVEY.md
section 2.5): frames advance, the HUD is the shared format, flag toggles
reset progressive accumulation (reference: TestWin.cpp:424-431), and the
HTTP surface (page / frame.png / stats / set) serves what the reference's
toypathtracer.html driver consumes."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

import toypathtracer_tpu as tpt
from toypathtracer_tpu.config import FLAG_ANIMATE, FLAG_PROGRESSIVE
from toypathtracer_tpu.serve import Viewer, make_handler

TINY = tpt.RenderConfig(width=64, height=40, samples_per_pixel=1,
                        max_depth=3)


def make_viewer(**kw):
    return Viewer(tpt.make_scene(big=False), TINY, **kw)


def test_viewer_steps_and_png():
    v = make_viewer()
    v.step_once()
    v.step_once()
    png, hud = v.snapshot()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert int(np.asarray(v.sess.state.frame)) == 2
    assert "Mrays/s" in hud and "frames 2" in hud


def test_toggle_resets_accumulation():
    v = make_viewer()
    v.step_once()
    v.step_once()
    v.set_flags(animate=True, progressive=True)
    v.step_once()  # applies the pending toggle, then renders frame 0
    assert v.sess.flags == (FLAG_ANIMATE | FLAG_PROGRESSIVE)
    assert int(np.asarray(v.sess.state.frame)) == 1  # reset, then one step
    # no-op toggle (same flags) must NOT reset
    v.set_flags(animate=True, progressive=True)
    v.step_once()
    assert int(np.asarray(v.sess.state.frame)) == 2


def test_backend_toggle_resets_accumulation():
    """Runtime renderer switch (the reference's 'g' key,
    TestWin.cpp:419-423): switching backends resets progressive
    accumulation; unknown names are rejected."""
    from functools import partial
    from toypathtracer_tpu.ops.pallas_render import render_frame_pallas

    fns = {"jnp": None,
           "pallas": partial(render_frame_pallas, interpret=True)}
    v = Viewer(tpt.make_scene(big=False), TINY, render_fns=fns,
               backend="jnp")
    v.step_once()
    v.step_once()
    assert v.backend == "jnp"
    assert v.set_backend("pallas") is True
    assert v.set_backend("bogus") is False
    v.step_once()  # applies the switch, resets, renders frame 0
    assert v.backend == "pallas"
    assert int(np.asarray(v.sess.state.frame)) == 1
    # same-name switch must NOT reset
    v.set_backend("pallas")
    v.step_once()
    assert int(np.asarray(v.sess.state.frame)) == 2


def test_http_surface():
    v = make_viewer()
    v.step_once()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(v))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"toypathtracer_tpu" in page and b"/frame.png" in page

        png = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=10).read())
        assert stats["frames"] == 1
        assert stats["progressive"] is True and stats["animate"] is False
        assert "Mrays/s" in stats["hud"]
        assert stats["backend"] == "default"
        assert stats["backends"] == ["default"]

        urllib.request.urlopen(
            base + "/set?animate=1&progressive=1", timeout=10).read()
        v.step_once()  # render thread applies the toggle
        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=10).read())
        assert stats["animate"] is True

        err = urllib.request.urlopen(base + "/nope", timeout=10)
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def test_png_roundtrip_matches_writer(tmp_path):
    """png_bytes and write_png (stdlib path) produce identical files."""
    from toypathtracer_tpu import io as image_io
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 1.0, (7, 5, 3)).astype(np.float32)
    data = image_io.png_bytes(img)
    # decode with PIL if present to validate the stdlib encoder
    try:
        from PIL import Image
        import io as _io
        arr = np.asarray(Image.open(_io.BytesIO(data)))
        assert arr.shape == (7, 5, 3)
        np.testing.assert_array_equal(arr, image_io.to_u8(img))
    except ImportError:
        assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_batched_viewer_matches_sequential():
    """Frame batching (Viewer(batch=N) -> render.frame.progressive_steps):
    N fused frames must advance the frame counter by N, count the same
    rays, and produce the same accumulated image as N sequential steps
    (same scene/time; the viewer batches only while static).  Animation
    forces per-frame stepping regardless of batch."""
    va = make_viewer()           # sequential
    vb = make_viewer(batch=3)    # fused
    va.time_scale = vb.time_scale = 0.0   # same (zero) animation time
    for _ in range(3):
        va.step_once()
    vb.step_once()
    assert int(np.asarray(va.sess.state.frame)) == 3
    assert int(np.asarray(vb.sess.state.frame)) == 3
    a = np.asarray(va.sess.state.accum)
    b = np.asarray(vb.sess.state.accum)
    # same math, different program shapes (python loop vs lax.scan):
    # tolerate compiler-instance contraction drift only
    assert np.abs(a - b).max() < 1e-5
    assert (a == b).mean() > 0.99
    # HUD frame counter advanced by the batch in one dispatch
    assert vb.timer.frames == 3
    # animation flag forces single-frame stepping
    vb.set_flags(animate=True, progressive=True)
    vb.step_once()  # toggle resets accum, then renders ONE frame
    assert int(np.asarray(vb.sess.state.frame)) == 1
