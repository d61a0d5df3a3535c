"""Pallas TPU wavefront render kernel (the fast path).

One fused kernel renders a (tile_h, tile_w) pixel tile end-to-end: per-pixel
RNG seeding, spp thin-lens camera rays, the full masked bounce loop
(intersect-all-spheres, 3-way material scatter, NEE shadow rays), and the
sample average -- all without leaving VMEM.  This is the TPU re-design of
the reference's GPU compute ports (reference: Cpp/Windows/ComputeShader.hlsl
main at :353-395, Cpp/Apple/Shaders.metal TraceGPU), with the mapping:

  8x8 thread groups            -> (tile_h, tile_w) VPU-resident pixel tiles
                                  on the Pallas grid
  groupshared scene staging    -> scene scalars + camera in SMEM
     (ComputeShader.hlsl:356-375)  (read per-sphere, broadcast over lanes)
  per-thread registers         -> whole-tile SoA arrays in VMEM/vregs
  InterlockedAdd ray counter   -> per-tile reduction to an SMEM cell,
     (ComputeShader.hlsl:394)     summed on the host side of the call

Why this beats the XLA-compiled jnp path: the jnp renderer's bounce loop
carries ~20 full-frame buffers through HBM every iteration (~75 MB/bounce
at 720p); here the entire ray state lives on-chip for the tile's whole
lifetime, so HBM traffic is just the final image write.  Each grid step
also runs its own `while` bounce loop, so tiles whose rays all die early
(sky hits) finish early -- the reference gets the same effect from its
`break` (ComputeShader.hlsl:300) at warp granularity.

The math is `ops.tracecore` -- the *same* functions the jnp renderer
executes -- so the two paths agree exactly (asserted in
tests/test_pallas.py with interpret mode on CPU, and on real TPU by the
verify flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..camera import camera_from_array_reader, camera_to_array, make_camera

_CACHE_SCENE = os.environ.get("TPT_CACHE_SCENE", "1") != "0"
from ..config import RenderConfig
from ..scene import Scene
from ..ops import tracecore as tc

# SMEM scene layout: (SCENE_ROWS, N) f32.  The TPU analog of the reference's
# 20-byte Sphere + 36-byte Material GPU buffers (TestWin.cpp:132-134),
# reshaped SoA like SpheresSoA (Maths.h:368-404).
ROW_CX, ROW_CY, ROW_CZ, ROW_SQR, ROW_INVR, ROW_R = range(6)
ROW_ALB = 6     # 6, 7, 8
ROW_EM = 9      # 9, 10, 11
ROW_ROUGH = 12
ROW_RI = 13
SCENE_ROWS = 14


def pack_scene(scene: Scene) -> jax.Array:
    """Scene pytree -> (SCENE_ROWS, N) f32 for SMEM transport.  Derived
    scalars (sqRadius, invRadius) are computed here, the analog of
    SpheresSoA's per-frame refresh (reference: Test.cpp:322-330)."""
    c = scene.center
    # Guard degenerate (zero/negative-radius, e.g. padded) spheres exactly
    # like scaled.ChunkedScenePort: inv_radius 0 instead of inf, so normals
    # stay finite on both paths.
    inv_radius = jnp.where(scene.radius > 0,
                           1.0 / jnp.maximum(scene.radius, 1e-8), 0.0)
    return jnp.stack([
        c[:, 0], c[:, 1], c[:, 2],
        scene.radius * scene.radius,
        inv_radius,
        scene.radius,
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.emissive[:, 0], scene.emissive[:, 1], scene.emissive[:, 2],
        scene.roughness,
        scene.ri,
    ]).astype(jnp.float32)


class SmemScenePort(tc.ScenePort):
    """ScenePort over an SMEM ref: per-sphere scalars are SMEM reads that
    broadcast against the tile's lane arrays.  stacked() is None, so the
    trace core fully unrolls the (static) sphere loop -- straight-line VPU
    code, the Pallas analog of the HLSL groupshared loop
    (ComputeShader.hlsl:245-266)."""

    def __init__(self, ref, mat_type, emissive_ids):
        self._ref = ref
        self._mat_type = mat_type
        self.n = len(mat_type)
        self.emissive_ids = emissive_ids

    def sphere(self, i: int) -> tc.SphereData:
        r = self._ref
        return tc.SphereData(
            cx=r[ROW_CX, i], cy=r[ROW_CY, i], cz=r[ROW_CZ, i],
            sq_radius=r[ROW_SQR, i], inv_radius=r[ROW_INVR, i],
            radius=r[ROW_R, i],
        )

    def material(self, i: int) -> tc.MaterialData:
        r = self._ref
        return tc.MaterialData(
            mtype=self._mat_type[i],
            alb=(r[ROW_ALB, i], r[ROW_ALB + 1, i], r[ROW_ALB + 2, i]),
            em=(r[ROW_EM, i], r[ROW_EM + 1, i], r[ROW_EM + 2, i]),
            roughness=r[ROW_ROUGH, i], ri=r[ROW_RI, i],
        )


class CachedScenePort(tc.ScenePort):
    """Materialize every per-sphere scalar ONCE at kernel start.

    The trace core calls sphere()/material() inside the bounce while-loop
    (3+ hit queries per bounce); reading SMEM there re-issues ~600 scalar
    loads + vector splats per bounce.  Caching hoists all reads before the
    loop, making them loop-invariant values the compiler keeps live -- the
    VMEM-residency analog of the reference's one-time cooperative copy of
    the scene into groupshared memory (ComputeShader.hlsl:356-375)."""

    def __init__(self, inner: tc.ScenePort):
        self.n = inner.n
        self.emissive_ids = inner.emissive_ids
        self._spheres = [inner.sphere(i) for i in range(inner.n)]
        self._mats = [inner.material(i) for i in range(inner.n)]

    def sphere(self, i: int) -> tc.SphereData:
        return self._spheres[i]

    def material(self, i: int) -> tc.MaterialData:
        return self._mats[i]


def _resolve_pix_per_lane(cfg: RenderConfig, pad_h: int, pad_w: int) -> int:
    """Static K for this call: falls back to 1 when the tile cannot host
    K aligned row bands (lane_h must be a multiple of the 8-row f32
    sublane).  Padded sub-images keep K -- the fused loop then masks ray
    counts per iteration (tracecore count_bounds) because a K-pixel
    lane's counter mixes K pixels and the end-of-kernel row mask cannot
    split them."""
    k = cfg.pix_per_lane
    if k <= 1:
        return 1
    if cfg.tile_h % k or (cfg.tile_h // k) % 8:
        return 1
    return k


def _render_kernel(cfg: RenderConfig, mat_type, emissive_ids, pix_per_lane,
                   masked_counts,
                   scene_ref, cam_ref, dyn_ref,
                   r_ref, g_ref, b_ref, cnt_ref,
                   it_ref=None, wk_ref=None):
    """Kernel body for one pixel tile.  dyn_ref (SMEM int32): [frame,
    x_off, y_off, x_end, y_end] -- the offsets place this pallas_call's
    sub-image in the global pixel grid (used by the row-sharded multi-chip
    path); x_end/y_end bound the logical (unpadded) sub-image.

    pix_per_lane=K > 1: the wavefront runs on a (tile_h/K, tile_w) lane
    block; lane (r, c) owns the K pixels (r + k*tile_h/K, c) of this
    tile and the flush writes each finished sample into its slot's row
    band (see tracecore.render_pixels_fused n_slots)."""
    tile_h, tile_w = r_ref.shape
    lane_h = tile_h // pix_per_lane
    y0 = dyn_ref[2] + pl.program_id(0) * tile_h
    x0 = dyn_ref[1] + pl.program_id(1) * tile_w
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (lane_h, tile_w), 0)
    xx = x0 + jax.lax.broadcasted_iota(jnp.int32, (lane_h, tile_w), 1)

    port = SmemScenePort(scene_ref, mat_type, emissive_ids)
    if _CACHE_SCENE:
        # Hoist all per-sphere SMEM reads before the bounce loop.  A/B'd
        # on v5e: keeping ~650 scalars live across the while loop trades
        # SMEM re-reads for scalar-register pressure; toggle via
        # TPT_CACHE_SCENE=0/1 when tuning.
        port = CachedScenePort(port)
    cam = camera_from_array_reader(lambda i: cam_ref[i])

    # Sample accumulation lives in the output VMEM refs, not the bounce
    # loop's carry: the flush hook trades 6 carried vector registers for 3
    # VMEM read-modify-writes per iteration (spills are the measured
    # bottleneck at the production tile size; accumulated values are
    # bit-identical -- see render_pixels_fused).
    zero_tile = jnp.zeros((tile_h, tile_w), jnp.float32)
    r_ref[:] = zero_tile
    g_ref[:] = zero_tile
    b_ref[:] = zero_tile

    if pix_per_lane == 1:
        def flush(finished, col):
            r_ref[:] = r_ref[:] + jnp.where(finished, col[0], 0.0)
            g_ref[:] = g_ref[:] + jnp.where(finished, col[1], 0.0)
            b_ref[:] = b_ref[:] + jnp.where(finished, col[2], 0.0)
    else:
        def flush(finished, col, slot):
            # one masked add per slot's row band (static slices; slot is
            # a per-lane vector, so each band takes the lanes currently
            # working that band's pixel)
            for k in range(pix_per_lane):
                sel = finished & (slot == k)
                lo, hi = k * lane_h, (k + 1) * lane_h
                r_ref[lo:hi] = r_ref[lo:hi] + jnp.where(sel, col[0], 0.0)
                g_ref[lo:hi] = g_ref[lo:hi] + jnp.where(sel, col[1], 0.0)
                b_ref[lo:hi] = b_ref[lo:hi] + jnp.where(sel, col[2], 0.0)

    # K-pixel lanes under tile padding: the per-lane counter mixes K
    # pixels, so padded pixels are masked out per iteration inside the
    # loop (count_bounds) instead of by the end-of-kernel row mask.
    bounds = (dyn_ref[3], dyn_ref[4]) \
        if (pix_per_lane > 1 and masked_counts) else None
    if it_ref is not None:
        # occupancy instrumentation (tools/occupancy.py): per-tile loop
        # trips + live-lane work, deterministic (see render_pixels_fused)
        _, raycnt, (iters, work) = tc.render_pixels_fused(
            port, cfg, cam, xx, yy, dyn_ref[0], flush=flush, stats=True,
            n_slots=pix_per_lane, slot_dy=lane_h, count_bounds=bounds)
        it_ref[pl.program_id(0), pl.program_id(1)] = iters
        wk_ref[pl.program_id(0), pl.program_id(1)] = work
    elif pix_per_lane == 1:
        _, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, dyn_ref[0],
                                     flush=flush)
    else:
        _, raycnt = tc.render_pixels_fused(
            port, cfg, cam, xx, yy, dyn_ref[0], flush=flush,
            n_slots=pix_per_lane, slot_dy=lane_h, count_bounds=bounds)
    inv_spp = jnp.float32(1.0 / cfg.samples_per_pixel)
    r_ref[:] = r_ref[:] * inv_spp
    g_ref[:] = g_ref[:] * inv_spp
    b_ref[:] = b_ref[:] * inv_spp
    # Tile-padding correctness: pixels outside the logical sub-image (it
    # is padded up to tile multiples) are rendered but must not count
    # rays -- the HUD/Mray/s contract counts exactly the reference's rays
    # (Test.cpp:122,199).  dyn[3]/dyn[4] are the exclusive x/y bounds.
    visible = (xx < dyn_ref[3]) & (yy < dyn_ref[4])
    raycnt = jnp.where(visible, raycnt, 0)
    # cnt_ref is the full (grid_h, grid_w) SMEM array (SMEM outputs can't be
    # (1,1)-blocked); each grid step writes its own cell.
    cnt_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(raycnt)


def render_tile_pallas(scene: Scene, cfg: RenderConfig, frame, x0, y0,
                       height: int, width: int, interpret: bool = False):
    """Render a (height, width) sub-image whose lower-left pixel sits at
    global (x0, y0), as a Pallas grid of (tile_h, tile_w) tiles.

    Drop-in for wavefront.render_tile (same signature contract; x0/y0 may
    be traced).  Returns ((3, height, width) f32, ray_count scalar int32).

    Arbitrary sizes: the sub-image is padded up to tile multiples, padded
    pixels are rendered (cheap, <1 extra tile row/col) but excluded from
    the ray count inside the kernel, and the result is cropped.
    """
    tile_h = cfg.tile_h
    tile_w = cfg.tile_w
    pad_h = -height % tile_h
    pad_w = -width % tile_w
    height_p, width_p = height + pad_h, width + pad_w
    gh, gw = height_p // tile_h, width_p // tile_w
    ppl = _resolve_pix_per_lane(cfg, pad_h, pad_w)

    packed = pack_scene(scene)
    cam = camera_to_array(make_camera(scene.camera, cfg.width / cfg.height))
    x0 = jnp.asarray(x0, jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    dyn = jnp.stack([
        jnp.asarray(frame, jnp.int32),
        x0,
        y0,
        x0 + width,   # exclusive logical bounds for ray-count masking
        y0 + height,
    ])

    kernel = functools.partial(_render_kernel, cfg, scene.mat_type,
                               scene.emissive_ids, ppl,
                               bool(pad_h or pad_w))
    plane = jax.ShapeDtypeStruct((height_p, width_p), jnp.float32)
    plane_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    r, g, b, cnt = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scene
            pl.BlockSpec(memory_space=pltpu.SMEM),  # camera
            pl.BlockSpec(memory_space=pltpu.SMEM),  # frame + offsets + bounds
        ],
        out_shape=(
            plane, plane, plane,
            jax.ShapeDtypeStruct((gh, gw), jnp.int32),
        ),
        out_specs=(
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(packed, cam, dyn)
    img = jnp.stack([r, g, b])
    if pad_h or pad_w:
        img = img[:, :height, :width]
    return img, jnp.sum(cnt)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_frame_pallas_stats(scene: Scene, cfg: RenderConfig, frame,
                              interpret: bool = False):
    """Instrumented full-frame render: identical image/rays to
    render_frame_pallas (asserted in tests/test_pallas.py) plus per-tile
    (iters, work) occupancy counters -- deterministic, so the bench
    claims they support are noise-free (tools/occupancy.py).

    Returns ((H, W, 3) f32, rays, iters (gh, gw) i32, work (gh, gw) i32);
    occupancy of a tile = work / (iters * tile_h * tile_w)."""
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    height, width = cfg.height, cfg.width
    pad_h = -height % tile_h
    pad_w = -width % tile_w
    height_p, width_p = height + pad_h, width + pad_w
    gh, gw = height_p // tile_h, width_p // tile_w

    packed = pack_scene(scene)
    cam = camera_to_array(make_camera(scene.camera, cfg.width / cfg.height))
    dyn = jnp.stack([jnp.asarray(frame, jnp.int32), jnp.int32(0),
                     jnp.int32(0), jnp.int32(width), jnp.int32(height)])

    kernel = functools.partial(_render_kernel, cfg, scene.mat_type,
                               scene.emissive_ids,
                               _resolve_pix_per_lane(cfg, pad_h, pad_w),
                               bool(pad_h or pad_w))
    plane = jax.ShapeDtypeStruct((height_p, width_p), jnp.float32)
    grid_i32 = jax.ShapeDtypeStruct((gh, gw), jnp.int32)
    plane_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    r, g, b, cnt, it, wk = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[smem, smem, smem],
        out_shape=(plane, plane, plane, grid_i32, grid_i32, grid_i32),
        out_specs=(plane_spec, plane_spec, plane_spec, smem, smem, smem),
        interpret=interpret,
    )(packed, cam, dyn)
    img = jnp.stack([r, g, b])[:, :height, :width]
    return jnp.transpose(img, (1, 2, 0)), jnp.sum(cnt), it, wk


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_frame_pallas(scene: Scene, cfg: RenderConfig, frame,
                        interpret: bool = False):
    """Full-frame Pallas render; signature-compatible with
    wavefront.render_frame.  Returns ((H, W, 3) f32, ray count int32)."""
    img, raycnt = render_tile_pallas(scene, cfg, frame, 0, 0,
                                     cfg.height, cfg.width,
                                     interpret=interpret)
    return jnp.transpose(img, (1, 2, 0)), raycnt
