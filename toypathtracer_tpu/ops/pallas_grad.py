"""Pallas TPU backward (gradient) kernel for the bounce loop.

The inverse-rendering step differentiates the full path tracer w.r.t. the
scene parameter arrays.  Reverse-mode through the XLA-compiled jnp loop
pays per-bounce residual traffic through HBM even with `jax.checkpoint`
(measured 73 Mray/s fwd+bwd vs 276 forward on v5e -- docs/PERFORMANCE.md);
this kernel runs the ENTIRE value-and-gradient computation for a pixel
tile inside one fused Pallas kernel, so the per-bounce carry snapshots the
checkpointed reverse sweep needs live in VMEM and never touch HBM.

Design (SURVEY.md section 7 stage 4; the loop being differentiated is the
reference's own iterative bounce formulation,
Cpp/Windows/ComputeShader.hlsl:294-343):

  * forward sweep: the SAME differentiable lockstep formulation the jnp
    path uses (tracecore.render_pixels lockstep + fixed-trip fori_loop +
    jax.checkpoint per bounce), traced inside the kernel -- gradients are
    therefore of the exact same function, asserted allclose vs `jax.grad`
    of the jnp path in tests/test_pallas_grad.py;
  * reverse sweep: `jax.vjp` of that trace, unrolled/scanned by Mosaic --
    saved carries (ro, rd, rng state, masks per depth) are VMEM arrays;
  * scene cotangents: the per-sphere scalars enter as broadcast scalars,
    so each adjoint is a full-tile reduction; they are accumulated across
    the sequential Pallas grid into one SMEM (SCENE_ROWS, N) output;
  * the pixel cotangent dL/d(pixel) arrives as three input planes, padded
    with ZEROS outside the logical image so padded tiles contribute no
    adjoint.

The public entry is `render_frame_pallas_diff` -- a `jax.custom_vjp` whose
primal is the fast fused forward kernel (ops/pallas_render.py) and whose
backward runs this kernel, then pulls the packed-scene cotangent back
through `pack_scene` (sq_radius/inv_radius adjoints) with `jax.vjp`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import camera_from_array_reader, camera_to_array, make_camera
from ..config import RenderConfig
from ..scene import Scene
from ..ops import tracecore as tc
from .pallas_render import (SCENE_ROWS, ROW_CX, ROW_CY, ROW_CZ, ROW_SQR,
                            ROW_INVR, ROW_R, ROW_ALB, ROW_EM, ROW_ROUGH,
                            ROW_RI, pack_scene, render_frame_pallas,
                            render_tile_pallas)


def _register_remat_lowering():
    """Teach Mosaic to lower `remat2` by inlining its jaxpr.

    The in-kernel vjp checkpoints each unrolled bounce body
    (tracecore.trace diff_unroll) so the reverse sweep keeps only
    inter-body carries in VMEM -- without remat the straight-line
    residuals overflow the 16M scoped-vmem limit (measured 19.57M at a
    16x128 tile).  jax's partial-eval leaves a `remat2` call eqn in the
    kernel jaxpr, and Mosaic (jax 0.8.x, pallas/mosaic/lowering.py) has
    no rule for it, failing with "Unimplemented primitive ... remat2".
    Inlining is exactly how jax's own MLIR path lowers it
    (ad_checkpoint.remat_lowering evaluates the jaxpr); liveness inside
    the kernel is Mosaic's register/VMEM allocator's job either way.

    Version-pinned by construction: registers only if remat2 has no
    rule yet, and degrades to a no-op if the internals moved."""
    try:
        from jax._src.ad_checkpoint import remat_p
        from jax._src.pallas.mosaic import lowering as ml

        already = any(remat_p in rules
                      for rules in ml.lowering_rules.values())
        if already:
            return

        def _remat_rule(ctx, *args, jaxpr, **_):
            lowering_context = ctx.lowering_context.replace(
                block_shapes=ctx.block_shapes)
            return ml.jaxpr_subcomp(lowering_context, jaxpr, *args)

        ml.register_lowering_rule(
            remat_p, kernel_types=[*ml.tpu_core.KernelType])(_remat_rule)
    except Exception:  # pragma: no cover - jax internals moved; the
        pass           # kernel then needs TPT_REMAT=0 to compile


_register_remat_lowering()


class TupleScenePort(tc.ScenePort):
    """ScenePort over a nested tuple sv[row][i] of traced scalars (the
    packed-scene layout of pallas_render.pack_scene).  Used as the
    differentiable input pytree of the in-kernel `jax.vjp`: gradients flow
    to every scalar, and `stacked()` is None so the trace core unrolls the
    sphere loop (straight-line VPU code, the Pallas norm)."""

    needs_safe_grad = True  # NaN-free sqrt in the unrolled hit loop

    def __init__(self, sv, mat_type, emissive_ids):
        self._sv = sv
        self._mat_type = mat_type
        self.n = len(mat_type)
        self.emissive_ids = emissive_ids

    def sphere(self, i: int) -> tc.SphereData:
        sv = self._sv
        return tc.SphereData(
            cx=sv[ROW_CX][i], cy=sv[ROW_CY][i], cz=sv[ROW_CZ][i],
            sq_radius=sv[ROW_SQR][i], inv_radius=sv[ROW_INVR][i],
            radius=sv[ROW_R][i],
        )

    def material(self, i: int) -> tc.MaterialData:
        sv = self._sv
        return tc.MaterialData(
            mtype=self._mat_type[i],
            alb=(sv[ROW_ALB][i], sv[ROW_ALB + 1][i], sv[ROW_ALB + 2][i]),
            em=(sv[ROW_EM][i], sv[ROW_EM + 1][i], sv[ROW_EM + 2][i]),
            roughness=sv[ROW_ROUGH][i], ri=sv[ROW_RI][i],
        )


def _grad_kernel(cfg: RenderConfig, mat_type, emissive_ids,
                 scene_ref, cam_ref, dyn_ref, gr_ref, gg_ref, gb_ref,
                 r_ref, g_ref, b_ref, cnt_ref, ds_ref):
    """One pixel tile: differentiable lockstep render + in-kernel vjp.

    Inputs: scene (SMEM, packed), camera (SMEM), dyn (SMEM: frame, x_off,
    y_off, x_end, y_end), pixel cotangent planes (VMEM tiles).  Outputs:
    primal color planes, per-tile ray count (SMEM), and the packed-scene
    cotangent ds (SMEM, accumulated across the sequential grid)."""
    tile_h, tile_w = r_ref.shape
    y0 = dyn_ref[2] + pl.program_id(0) * tile_h
    x0 = dyn_ref[1] + pl.program_id(1) * tile_w
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xx = x0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    cam = camera_from_array_reader(lambda i: cam_ref[i])

    n = len(mat_type)
    # Scene scalars are READ outside the vjp'd function and passed in as
    # the differentiable pytree (ref reads are not vjp inputs).
    sv = tuple(tuple(scene_ref[r, i] for i in range(n))
               for r in range(SCENE_ROWS))

    def tile_fn(sv_in):
        port = TupleScenePort(sv_in, mat_type, emissive_ids)
        # diff_unroll: Mosaic cannot lower reverse-mode through lax
        # loops (scan-ys, see tracecore.trace docstring) -- in-kernel
        # AD requires the straight-line form.
        col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, dyn_ref[0],
                                       differentiable=True,
                                       diff_unroll=True)
        return col, raycnt

    (col, vjp_fn, raycnt) = jax.vjp(tile_fn, sv, has_aux=True)
    d_sv, = vjp_fn((gr_ref[:], gg_ref[:], gb_ref[:]))

    r_ref[:] = col[0]
    g_ref[:] = col[1]
    b_ref[:] = col[2]

    visible = (xx < dyn_ref[3]) & (yy < dyn_ref[4])
    cnt_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(
        jnp.where(visible, raycnt, 0))

    # Accumulate the packed-scene cotangent across the (sequential on TPU)
    # grid.  The first tile must INITIALIZE via a true select: the
    # pre-init SMEM read is garbage (NaN in interpret mode), and an
    # arithmetic mask (0.0 * garbage) propagates NaN instead of masking.
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for r in range(SCENE_ROWS):
        for i in range(n):
            ds_ref[r, i] = jnp.where(first, d_sv[r][i],
                                     ds_ref[r, i] + d_sv[r][i])


def _lockstep_fwd_kernel(cfg: RenderConfig, mat_type, emissive_ids,
                         scene_ref, cam_ref, dyn_ref,
                         r_ref, g_ref, b_ref, cnt_ref):
    """Forward-only twin of _grad_kernel: the LOCKSTEP (differentiable)
    formulation rendered without the vjp.  Same TupleScenePort + same
    tc.render_pixels(differentiable=True) trace, so its image is the
    exact primal the gradient kernel differentiates -- the consistent
    (value, grad) pairing render_frame_pallas_diff(lockstep_primal=True)
    promises."""
    tile_h, tile_w = r_ref.shape
    y0 = dyn_ref[2] + pl.program_id(0) * tile_h
    x0 = dyn_ref[1] + pl.program_id(1) * tile_w
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xx = x0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    cam = camera_from_array_reader(lambda i: cam_ref[i])
    n = len(mat_type)
    sv = tuple(tuple(scene_ref[r, i] for i in range(n))
               for r in range(SCENE_ROWS))
    port = TupleScenePort(sv, mat_type, emissive_ids)
    col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, dyn_ref[0],
                                   differentiable=True, diff_unroll=True)
    r_ref[:] = col[0]
    g_ref[:] = col[1]
    b_ref[:] = col[2]
    visible = (xx < dyn_ref[3]) & (yy < dyn_ref[4])
    cnt_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(
        jnp.where(visible, raycnt, 0))


def render_tile_lockstep_pallas(scene: Scene, cfg: RenderConfig, frame,
                                x0, y0, height: int, width: int,
                                interpret: bool = False):
    """LOCKSTEP-formulation forward render of a (height, width) sub-image
    (Pallas, grad-kernel tiling).  Returns (img (3, height, width),
    ray_count).  Slower than the fused forward (fixed-trip loops, no
    early exit) -- use only when primal/gradient consistency matters
    (render_frame_pallas_diff(lockstep_primal=True))."""
    tile_h = cfg.grad_tile_h
    tile_w = cfg.grad_tile_w
    pad_h = -height % tile_h
    pad_w = -width % tile_w
    height_p, width_p = height + pad_h, width + pad_w
    gh, gw = height_p // tile_h, width_p // tile_w

    packed = pack_scene(scene)
    cam = camera_to_array(make_camera(scene.camera, cfg.width / cfg.height))
    x0 = jnp.asarray(x0, jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    dyn = jnp.stack([jnp.asarray(frame, jnp.int32), x0, y0,
                     x0 + width, y0 + height])
    kernel = functools.partial(_lockstep_fwd_kernel, cfg, scene.mat_type,
                               scene.emissive_ids)
    plane = jax.ShapeDtypeStruct((height_p, width_p), jnp.float32)
    plane_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    r, g, b, cnt = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scene
            pl.BlockSpec(memory_space=pltpu.SMEM),   # camera
            pl.BlockSpec(memory_space=pltpu.SMEM),   # frame + offsets
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


def render_tile_grad_pallas(scene: Scene, cfg: RenderConfig, frame,
                            g_img, x0, y0, height: int, width: int,
                            interpret: bool = False):
    """Value-and-scene-cotangent of a (height, width) sub-image at global
    offset (x0, y0), given the pixel cotangent g_img ((3, height, width)).

    Returns (img (3, height, width), ray_count, d_packed (SCENE_ROWS, N)).
    The primal image here is the LOCKSTEP formulation (the differentiable
    sibling of the fused forward; values agree to ~1e-3 -- see
    tracecore.render_pixels_fused)."""
    tile_h = cfg.grad_tile_h
    tile_w = cfg.grad_tile_w
    pad_h = -height % tile_h
    pad_w = -width % tile_w
    height_p, width_p = height + pad_h, width + pad_w
    gh, gw = height_p // tile_h, width_p // tile_w

    packed = pack_scene(scene)
    n = scene.n_spheres
    cam = camera_to_array(make_camera(scene.camera, cfg.width / cfg.height))
    x0 = jnp.asarray(x0, jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    dyn = jnp.stack([jnp.asarray(frame, jnp.int32), x0, y0,
                     x0 + width, y0 + height])

    # Pad the cotangent with zeros: padded pixels then contribute exactly
    # zero adjoint (and their primal render is cropped away).
    g_img = jnp.asarray(g_img, jnp.float32)
    if pad_h or pad_w:
        g_img = jnp.pad(g_img, ((0, 0), (0, pad_h), (0, pad_w)))

    kernel = functools.partial(_grad_kernel, cfg, scene.mat_type,
                               scene.emissive_ids)
    plane = jax.ShapeDtypeStruct((height_p, width_p), jnp.float32)
    plane_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    r, g, b, cnt, ds = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scene
            pl.BlockSpec(memory_space=pltpu.SMEM),   # camera
            pl.BlockSpec(memory_space=pltpu.SMEM),   # frame + offsets
            plane_spec, plane_spec, plane_spec,      # pixel cotangent
        ],
        out_shape=(
            plane, plane, plane,
            jax.ShapeDtypeStruct((gh, gw), jnp.int32),
            jax.ShapeDtypeStruct((SCENE_ROWS, n), jnp.float32),
        ),
        out_specs=(
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(packed, cam, dyn, g_img[0], g_img[1], g_img[2])
    img = jnp.stack([r, g, b])
    if pad_h or pad_w:
        img = img[:, :height, :width]
    return img, jnp.sum(cnt), ds


def scene_cotangent_from_packed(scene: Scene, d_packed) -> Scene:
    """Pull the packed-scene cotangent back through pack_scene (the
    sq_radius/inv_radius/radius chain) to a Scene-shaped gradient."""
    _, pb = jax.vjp(pack_scene, scene)
    d_scene, = pb(d_packed)
    return d_scene


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def render_tile_pallas_diff(scene: Scene, cfg: RenderConfig, frame,
                            x0, y0, height: int, width: int,
                            interpret: bool = False):
    """Differentiable (height, width) sub-image at global offset (x0, y0):
    forward = the fused Pallas kernel (render_tile_pallas), backward = the
    fused in-kernel-vjp gradient kernel (render_tile_grad_pallas).

    The tile-level seam the SHARDED training step needs: each mesh shard
    differentiates its own row band with the fast kernels, and shard_map's
    AD psums the replicated scene's cotangent over the mesh -- the TPU
    form of the reference's cross-worker atomic reduce
    (reference: Cpp/Source/Test.cpp:299).  Returns ((3, height, width)
    f32, ray count)."""
    return render_tile_pallas(scene, cfg, frame, x0, y0, height, width,
                              interpret=interpret)


def _tile_diff_fwd(scene, cfg, frame, x0, y0, height, width, interpret):
    out = render_tile_pallas(scene, cfg, frame, x0, y0, height, width,
                             interpret=interpret)
    return out, (scene, frame, x0, y0)


def _tile_diff_bwd(cfg, height, width, interpret, res, cts):
    scene, frame, x0, y0 = res
    g_img, _ = cts  # ray-count cotangent is symbolically zero (int)
    _, _, d_packed = render_tile_grad_pallas(
        scene, cfg, frame, g_img, x0, y0, height, width,
        interpret=interpret)
    d_scene = scene_cotangent_from_packed(scene, d_packed)

    def f0(v):
        return np.zeros(jnp.shape(v), dtype=jax.dtypes.float0)

    return d_scene, f0(frame), f0(x0), f0(y0)


render_tile_pallas_diff.defvjp(_tile_diff_fwd, _tile_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def render_frame_pallas_diff(scene: Scene, cfg: RenderConfig, frame,
                             interpret: bool = False,
                             lockstep_primal: bool = False):
    """Differentiable full-frame render whose forward is the fused Pallas
    kernel and whose backward is the fused Pallas gradient kernel.

    Drop-in for wavefront.render_frame(..., differentiable=True) as a loss
    building block: returns ((H, W, 3) f32, ray count).  Gradients are of
    the lockstep formulation (identical to the jnp differentiable path;
    asserted in tests/test_pallas_grad.py).

    lockstep_primal selects which formulation renders the VALUE:
      False (default, fastest): the fused forward kernel.  Values agree
        with the differentiated lockstep formulation only to ~1e-3 (the
        forward paths' documented cross-formulation drift,
        render_pixels_fused docstring; bounded by
        tests/test_pallas_grad.py::test_fused_vs_lockstep_primal_drift).
        Fine for L2-style losses where the mismatch is noise-level.
      True: the lockstep forward kernel (render_tile_lockstep_pallas) --
        the EXACT function the backward differentiates, so (value, grad)
        are a consistent pair (e.g. for line searches, loss landscapes,
        or losses sharp enough that 1e-3 of primal drift matters).
        Costs the lockstep loop's lower lane occupancy on the forward.
    """
    if lockstep_primal:
        img, rays = render_tile_lockstep_pallas(
            scene, cfg, frame, 0, 0, cfg.height, cfg.width,
            interpret=interpret)
        return jnp.transpose(img, (1, 2, 0)), rays
    return render_frame_pallas(scene, cfg, frame, interpret=interpret)


def _diff_fwd(scene, cfg, frame, interpret, lockstep_primal):
    out = render_frame_pallas_diff(scene, cfg, frame, interpret,
                                   lockstep_primal)
    return out, (scene, frame)


def _diff_bwd(cfg, interpret, lockstep_primal, res, cts):
    scene, frame = res
    g_img, _ = cts  # ray-count cotangent is symbolically zero (int)
    g_planes = jnp.transpose(g_img, (2, 0, 1))
    _, _, d_packed = render_tile_grad_pallas(
        scene, cfg, frame, g_planes, 0, 0, cfg.height, cfg.width,
        interpret=interpret)
    d_scene = scene_cotangent_from_packed(scene, d_packed)
    d_frame = np.zeros(jnp.shape(frame), dtype=jax.dtypes.float0)
    return d_scene, d_frame


render_frame_pallas_diff.defvjp(_diff_fwd, _diff_bwd)
