"""Frame orchestration: animation, progressive accumulation, sessions.

TPU-native equivalent of the reference's UpdateTest/DrawTest pair
(reference: Cpp/Source/Test.cpp:240-367).  The mutable global state of the
reference (sphere array, accumulation backbuffer, frame counter) becomes an
explicit, checkpointable `FrameState` pytree threaded through a pure jitted
step -- the progressive accumulation buffer IS the checkpoint/resume state
(see SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from ..scene import Scene
from . import wavefront


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameState:
    """Progressive accumulation state: (accum buffer, frame count).
    Reference analog: g_Backbuffer + frameCount (TestWin.cpp:308-340);
    reset to zero whenever flags are toggled (TestWin.cpp:424-431)."""

    accum: jax.Array        # (H, W, 3) f32 running average
    frame: jax.Array        # () int32


def init_frame_state(cfg: RenderConfig) -> FrameState:
    return FrameState(
        accum=jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        frame=jnp.int32(0),
    )


def lerp_factor(frame, flags: int, cfg: RenderConfig):
    """Progressive blend factor (reference: Test.cpp:272-276):
    lerpFac = frame/(frame+1), x animate_smoothing when animating,
    0 when not progressive."""
    fac = frame.astype(jnp.float32) / (frame.astype(jnp.float32) + 1.0)
    if flags & FLAG_ANIMATE:
        fac = fac * jnp.float32(cfg.animate_smoothing)
    if not (flags & FLAG_PROGRESSIVE):
        fac = jnp.zeros_like(fac)
    return fac


def scene_for_frame(scene: Scene, time, flags: int) -> Scene:
    """UpdateTest's scene mutation step (reference: Test.cpp:304-308)."""
    if flags & FLAG_ANIMATE:
        return scene.animate(time)
    return scene


@partial(jax.jit, static_argnames=("cfg", "flags", "render_fn"),
         donate_argnums=(0,))
def progressive_step(state: FrameState, scene: Scene, time,
                     cfg: RenderConfig, flags: int = FLAG_PROGRESSIVE,
                     render_fn: Optional[Callable] = None):
    """One UpdateTest+DrawTest step: animate, render, blend into the
    accumulator.  Returns (new_state, displayed image, ray count).

    `render_fn(scene, cfg, frame) -> (img, raycount)` defaults to the jnp
    wavefront renderer; the Pallas and sharded renderers slot in here.

    The incoming FrameState is DONATED: XLA blends in place, reusing the
    previous accumulator's HBM for the new one -- the TPU analog of the
    reference GPU port's ping-pong SRV/UAV texture pair
    (TestWin.cpp:285-297).  Consequences callers must respect (asserted
    in tests/test_wavefront.py::test_progressive_step_donation):
      * the passed-in state is dead after the call (RenderSession
        replaces it unconditionally);
      * the returned image aliases new_state.accum -- materialize it
        (np.asarray) before the NEXT step if you keep it (the CLI/viewer
        encode to PNG immediately, which does exactly that).
    """
    if render_fn is None:
        render_fn = wavefront.render_frame
    scene_t = scene_for_frame(scene, time, flags)
    img, raycount = render_fn(scene_t, cfg, state.frame)
    fac = lerp_factor(state.frame, flags, cfg)
    # NaN guard on the history buffer (reference: Shaders.metal TraceGPU
    # tail: !isfinite(prev) -> 0).
    prev = jnp.where(jnp.isfinite(state.accum), state.accum, 0.0)
    blended = prev * fac + img * (1.0 - fac)
    new_state = FrameState(accum=blended, frame=state.frame + 1)
    return new_state, blended, raycount


@partial(jax.jit, static_argnames=("cfg", "flags", "render_fn", "n"),
         donate_argnums=(0,))
def progressive_steps(state: FrameState, scene: Scene, time,
                      cfg: RenderConfig, flags: int, render_fn, n: int):
    """n progressive frames fused into ONE device program (lax.scan).

    Each timed device call carries a fixed dispatch + final-transfer cost
    (measured ~250-390 ms through the TPU tunnel,
    docs/measured/bench_frames_r4.json) -- at interactive sizes that floor
    dominates a single ~10-30 ms frame, so frontends that only display
    the ACCUMULATED image (the converge-while-you-look loop) should batch
    several frames per dispatch.  Semantics are exactly n sequential
    progressive_step calls with the same `time` (callers batch only when
    PROGRESSIVE accumulation is on and animation is off: without
    progressive each frame overwrites the accumulator, so n-1 of n fused
    frames would be pure waste, and an animated scene needs per-frame
    wall-clock time); the returned image is the final accumulator and
    raycount is the PER-FRAME (n,) int32 vector -- sum it on host with
    sum_rays().  Per-frame counts are each well inside int32 (the render
    kernels' own counter dtype), but a fused-on-device int32 SUM would
    silently wrap for large n x resolution x spp (e.g. 64 fused 4K
    frames), so the summing is the host's job in int64, exactly like
    bench.py's protocol.  lax.scan compiles the body once, so n does not
    grow compile time.
    """
    if render_fn is None:
        render_fn = wavefront.render_frame
    scene_t = scene_for_frame(scene, time, flags)

    def body(st, _):
        img, raycount = render_fn(scene_t, cfg, st.frame)
        fac = lerp_factor(st.frame, flags, cfg)
        prev = jnp.where(jnp.isfinite(st.accum), st.accum, 0.0)
        blended = prev * fac + img * (1.0 - fac)
        return FrameState(accum=blended, frame=st.frame + 1), raycount

    new_state, rays = jax.lax.scan(body, state, None, length=n)
    return new_state, new_state.accum, rays


def sum_rays(raycount) -> int:
    """Exact host-side total of a raycount returned by progressive_step
    (scalar) or progressive_steps ((n,) per-frame vector): int64 sum, no
    int32 wrap at any n/resolution/spp."""
    return int(np.asarray(raycount).astype(np.int64).sum())


class RenderSession:
    """Stateful convenience wrapper for CLIs/frontends: owns the FrameState,
    resets it on flag toggles (reference: TestWin.cpp:419-432)."""

    def __init__(self, scene: Scene, cfg: RenderConfig,
                 flags: int = FLAG_PROGRESSIVE,
                 render_fn: Optional[Callable] = None):
        if isinstance(scene, Scene):
            # The one host-side seam every user scene passes through
            # (CLI, viewer, direct API): warn on configurations the fast
            # kernels' interval-overlap shadow test darkens (emissive
            # sphere embedded in an occluder -- see tracecore._occ_test).
            # ScaledScene fields are generated, always-safe layouts.
            from ..scene import validate_scene
            validate_scene(scene)
        self.scene = scene
        self.cfg = cfg
        self.flags = flags
        self.render_fn = render_fn
        self.state = init_frame_state(cfg)

    def set_flags(self, flags: int):
        if flags != self.flags:
            self.flags = flags
            self.state = init_frame_state(self.cfg)  # reset accumulation

    def step(self, time: float):
        self.state, img, raycount = progressive_step(
            self.state, self.scene, jnp.float32(time), self.cfg, self.flags,
            self.render_fn)
        return img, raycount

    def steps(self, time: float, n: int):
        """n fused progressive frames (see progressive_steps); n=1 is
        exactly step()."""
        if n <= 1:
            return self.step(time)
        self.state, img, raycount = progressive_steps(
            self.state, self.scene, jnp.float32(time), self.cfg, self.flags,
            self.render_fn, n)
        return img, raycount
