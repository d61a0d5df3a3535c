"""Performance HUD + profiling helpers.

TPU-native equivalent of the reference's cross-frontend perf instrumentation
(SURVEY.md section 5): windowed wall-clock averages (reference:
Cpp/Windows/TestWin.cpp:310-336 uses a 10-frame QPC window; Renderer.mm
:218-249 uses mach_absolute_time) and the shared HUD string
`"%.2fms (%.1f FPS) %.1fMrays/s %.2fMrays/frame frames %i"`
(TestWin.cpp:330, Renderer.mm:251-253, Cs/Program.cs:31).

Ray counting matches the reference exactly: every primary, bounce, and
shadow ray increments the counter (Test.cpp:122, 199); the renderers
return that count per frame and this module turns it into Mray/s.

`trace_to(...)` wraps jax.profiler for device-level traces (the analog of
the reference's D3D11 timestamp queries, TestWin.cpp:342-358).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field


HUD_FORMAT = "%s %.2fms (%.1f FPS) %.1fMrays/s %.2fMrays/frame frames %i"


def hud_string(title: str, seconds: float, rays: int, frames: int) -> str:
    """The reference HUD line (reference: TestWin.cpp:328-331)."""
    s = seconds if seconds > 0 else 1e-9
    return HUD_FORMAT % (title, seconds * 1000.0, 1.0 / s,
                         rays / s * 1.0e-6, rays * 1.0e-6, frames)


@dataclass
class FrameTimer:
    """Windowed frame timing (reference: TestWin.cpp:310-336, a 10-frame
    window on QPC).  Feed it (dt_seconds, ray_count) per frame; read the
    averaged HUD whenever `window` frames have elapsed."""

    window: int = 10
    title: str = "TPU path tracer"
    _samples: deque = field(default_factory=deque)
    _frames: int = 0

    def add(self, dt: float, rays: int, count: int = 1) -> None:
        """Record `count` frames rendered in `dt` seconds total (count > 1
        = a fused multi-frame dispatch, render.frame.progressive_steps).
        One per-frame sample is pushed PER FRAME (not per dispatch), so
        the window stays the reference's 10-FRAME window
        (TestWin.cpp:310-336) and the HUD reacts to rate changes at the
        same frame horizon regardless of batching."""
        self._frames += count
        per = (dt / count, rays / count)
        for _ in range(min(count, self.window)):
            self._samples.append(per)
        while len(self._samples) > self.window:
            self._samples.popleft()

    @property
    def frames(self) -> int:
        return self._frames

    def averages(self):
        """(mean seconds/frame, mean rays/frame) over the window."""
        if not self._samples:
            return 0.0, 0
        n = len(self._samples)
        return (sum(s for s, _ in self._samples) / n,
                sum(r for _, r in self._samples) / n)

    def hud(self) -> str:
        s, r = self.averages()
        return hud_string(self.title, s, int(r), self._frames)

    def mray_s(self) -> float:
        s, r = self.averages()
        return r / s * 1e-6 if s > 0 else 0.0


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler device trace around a block (the analog of
    the reference's GPU timestamp queries).  View with TensorBoard or
    xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_device_call(fn, *args, sync=None):
    """Wall-time one device call, forcing completion via host transfer
    (axon's block_until_ready is unreliable -- see verify skill).

    `sync(result) -> array to transfer` defaults to the first leaf."""
    import jax
    import numpy as np

    t0 = time.perf_counter()
    out = fn(*args)
    leaf = sync(out) if sync is not None else jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    return time.perf_counter() - t0, out
