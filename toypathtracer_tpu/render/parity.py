"""CPU-parity renderer: reproduces the reference's *scalar C++* semantics.

Where the wavefront renderer follows the reference's GPU ports, this
renderer replays the CPU core exactly (reference: Cpp/Source/Test.cpp:195-300,
Maths.cpp:20-37) so its output can be asserted allclose against a compiled
build of the reference itself (tests/golden/*.npz, produced by
tools/gen_golden.py):

  * per-ROW RNG seeding `(y*9781 + frame*6271) | 1`, with the state threaded
    sequentially through every pixel and sample of the row (Test.cpp:280);
  * rejection-loop disk/sphere samplers with variable draw count
    (Maths.cpp:20-37);
  * the CPU recursion's extra depth==kMaxDepth level returning ungated
    material emission (Test.cpp:207, 219).

Formulation: rows are the vector lanes (vmap), pixels are a sequential
lax.scan (the RNG dependency chain), each sample runs the shared trace core
with CPU samplers.  Radiance accumulates iteratively (mathematically equal
to the reference recursion, Test.cpp:216; float association differs, hence
allclose rather than bit-equality).

This path exists for validation only -- it is deliberately row-sequential
and slow; use render/wavefront.py or the Pallas kernel for real work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import make_camera
from ..config import RenderConfig
from ..ops import tracecore as tc
from ..scene import Scene
from .wavefront import ArrayScenePort


def _render_row(scene: Scene, cfg: RenderConfig, frame, y):
    """Render one image row with sequential per-row RNG threading."""
    port = ArrayScenePort(scene)
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    state0 = (
        y.astype(jnp.uint32) * jnp.uint32(9781)
        + jnp.uint32(frame) * jnp.uint32(6271)
    ) | jnp.uint32(1)
    fy = y.astype(jnp.float32)

    def pixel_step(state, x):
        fx = x.astype(jnp.float32)
        col = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        raycnt = jnp.int32(0)
        for _ in range(cfg.samples_per_pixel):
            state, ur = tc.rand01(state)
            u = (fx + ur) * jnp.float32(cfg.inv_width)
            state, vr = tc.rand01(state)
            v = (fy + vr) * jnp.float32(cfg.inv_height)
            state, ro, rd = tc.camera_get_ray(cam, u, v, state,
                                              tc.CPU_SAMPLERS)
            c, state, rc = tc.trace_cpu_exact(port, cfg, ro, rd, state)
            col = tc.add3(col, c)
            raycnt = raycnt + rc
        col = tc.scale3(col, jnp.float32(1.0 / cfg.samples_per_pixel))
        return state, (jnp.stack(col), raycnt)

    _, (cols, counts) = jax.lax.scan(pixel_step, state0,
                                     jnp.arange(cfg.width, dtype=jnp.int32))
    return cols, jnp.sum(counts)


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_parity(scene: Scene, cfg: RenderConfig, frame):
    """Render one frame with CPU-scalar semantics.

    Returns (image (H, W, 3) f32 with row 0 at the bottom, ray_count int32)
    -- directly comparable to the reference oracle's backbuffer.
    """
    ys = jnp.arange(cfg.height, dtype=jnp.int32)
    cols, counts = jax.vmap(lambda y: _render_row(scene, cfg, frame, y))(ys)
    return cols, jnp.sum(counts)


def _render_pixel_pp(scene: Scene, cfg: RenderConfig, cam, frame, x, y):
    """One pixel with CPU samplers but an independent per-pixel RNG stream
    (the reference's GPU seeding scheme, ComputeShader.hlsl:380)."""
    port = ArrayScenePort(scene)
    state = tc.seed_pixels(x, y, frame)
    fx = x.astype(jnp.float32)
    fy = y.astype(jnp.float32)
    col = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
    raycnt = jnp.int32(0)
    for _ in range(cfg.samples_per_pixel):
        state, ur = tc.rand01(state)
        u = (fx + ur) * jnp.float32(cfg.inv_width)
        state, vr = tc.rand01(state)
        v = (fy + vr) * jnp.float32(cfg.inv_height)
        state, ro, rd = tc.camera_get_ray(cam, u, v, state, tc.CPU_SAMPLERS)
        c, state, rc = tc.trace_cpu_exact(port, cfg, ro, rd, state)
        col = tc.add3(col, c)
        raycnt = raycnt + rc
    col = tc.scale3(col, jnp.float32(1.0 / cfg.samples_per_pixel))
    return jnp.stack(col), raycnt


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_parity_pp(scene: Scene, cfg: RenderConfig, frame):
    """CPU-scalar semantics with PER-PIXEL seeding.

    Matches the oracle built by tools/gen_golden.py with pixel_seed=True
    (the reference's row loop mechanically reseeded per pixel with its own
    GPU formula).  Because every pixel's RNG stream is independent, a
    flipped rejection-loop branch decorrelates only that one pixel --
    unlike the sequential per-row threading (Test.cpp:280) where one flip
    decorrelates the whole rest of the row -- so full-frame-tight golden
    gates become possible (tests/test_parity.py).
    """
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    ys = jnp.arange(cfg.height, dtype=jnp.int32)
    xs = jnp.arange(cfg.width, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(xs, ys)  # (H, W)
    cols, counts = jax.vmap(jax.vmap(
        lambda x, y: _render_pixel_pp(scene, cfg, cam, frame, x, y)))(xx, yy)
    return cols, jnp.sum(counts)
