"""Pure-jnp wavefront renderer (the reference/differentiable path).

Renders whole pixel grids through `ops.tracecore` -- numerically identical
to the Pallas kernel (ops/pallas_render.py), which shares the same trace
core.  XLA compiles this to fused VPU elementwise code; it is the
correctness fixture for the Pallas path, the gradient path (fixed-trip
loops), and the fallback on non-TPU backends.

Semantics: the reference's GPU-port formulation (see tracecore docstring).
Image layout: (H, W, 3) float32 with row 0 at the *bottom* (v ~ 0), same as
the reference backbuffer (Test.cpp:278-297).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import make_camera
from ..config import RenderConfig
from ..ops import tracecore as tc
from ..scene import Scene


class ArrayScenePort(tc.ScenePort):
    """ScenePort over the Scene pytree: per-sphere scalars via static
    indexing (cheap slices under jit)."""

    def __init__(self, scene: Scene):
        self._s = scene
        self.n = scene.n_spheres
        self.emissive_ids = scene.emissive_ids
        # Precompute derived scalars once (UpdateDerivedData, Maths.h:359).
        self._sq_radius = scene.radius * scene.radius
        self._inv_radius = 1.0 / scene.radius
        mt = np.asarray(scene.mat_type)
        self._stacked = dict(
            cx=scene.center[:, 0], cy=scene.center[:, 1],
            cz=scene.center[:, 2],
            sq_radius=self._sq_radius, inv_radius=self._inv_radius,
            alb_r=scene.albedo[:, 0], alb_g=scene.albedo[:, 1],
            alb_b=scene.albedo[:, 2],
            em_r=scene.emissive[:, 0], em_g=scene.emissive[:, 1],
            em_b=scene.emissive[:, 2],
            roughness=scene.roughness, ri=scene.ri,
            is_lam=jnp.asarray(mt == 0), is_met=jnp.asarray(mt == 1),
            is_die=jnp.asarray(mt == 2),
        )

    def stacked(self):
        return self._stacked

    def sphere(self, i: int) -> tc.SphereData:
        s = self._s
        return tc.SphereData(
            cx=s.center[i, 0], cy=s.center[i, 1], cz=s.center[i, 2],
            sq_radius=self._sq_radius[i], inv_radius=self._inv_radius[i],
            radius=s.radius[i],
        )

    def material(self, i: int) -> tc.MaterialData:
        s = self._s
        return tc.MaterialData(
            mtype=s.mat_type[i],
            alb=(s.albedo[i, 0], s.albedo[i, 1], s.albedo[i, 2]),
            em=(s.emissive[i, 0], s.emissive[i, 1], s.emissive[i, 2]),
            roughness=s.roughness[i], ri=s.ri[i],
        )


def render_tile(scene: Scene, cfg: RenderConfig, frame, x0, y0,
                tile_h: int, tile_w: int, differentiable: bool = False):
    """Render a (tile_h, tile_w) pixel tile whose lower-left pixel is at
    global coordinates (x0, y0).  This is the unit the sharding layer
    distributes (the TPU analog of the reference's 4-row enkiTS grains,
    Test.cpp:356-361).

    Returns (col (3, tile_h, tile_w), ray_count scalar int32).
    """
    port = ArrayScenePort(scene)
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xx = x0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, frame,
                                   differentiable=differentiable)
    img = jnp.stack(col, axis=0)
    return img, jnp.sum(raycnt)


@partial(jax.jit, static_argnames=("cfg", "differentiable"))
def render_frame(scene: Scene, cfg: RenderConfig, frame,
                 differentiable: bool = False):
    """Render one full frame.

    Returns (image (H, W, 3) f32, ray_count scalar int32).  `frame` is a
    traced int (no recompile across frames); it seeds the per-pixel RNG
    (tracecore.seed_pixels) so every frame of a progressive sequence uses a
    fresh sample set, exactly like the reference (ComputeShader.hlsl:380).
    """
    img, raycnt = render_tile(scene, cfg, frame, 0, 0, cfg.height, cfg.width,
                              differentiable=differentiable)
    return jnp.transpose(img, (1, 2, 0)), raycnt
