"""Differentiable inverse rendering: recover scene parameters from images.

The reference has no analog -- this is the framework's north-star extension
(BASELINE.json config 3): the scene parameter arrays (`Scene.center`,
`radius`, `albedo`, `emissive`, `roughness`, `ri`) are optimized with Adam
on a pixel-L2 loss against a target render.  Gradients flow through the
full wavefront path tracer (`render/wavefront.py` with fixed-trip bounce
loops); discontinuous events (nearest-hit argmin, shadow-ray visibility,
dielectric branch choice) use the straight-through gradient of the selected
branch -- `jnp.where` routes cotangents only into the chosen values, and
`ops.tracecore.safe_sqrt_pos` keeps masked-out lanes NaN-free.

Visibility boundaries (the north star's "reparameterized/edge-aware
gradients"): hard hit/miss selects drop the silhouette term of
d(pixel)/d(geometry), which FD shows is the DOMINANT term for sphere
centers/radii -- pathwise AD alone cannot recover geometry.  Setting
`RenderConfig.soft_silhouette_eps > 0` enables the soft-silhouette
estimator (tracecore.bounce_parts soft=True): a straight-through sigmoid
of the winning ray-sphere discriminant blends hit vs sky radiance in the
BACKWARD pass only (forward image bit-unchanged; asserted in
tests/test_soft_silhouette.py), restoring a smooth surrogate of the
boundary term.  One-sided (hit lanes only): a missed sphere's shading is
not computed, so the miss side would wrongly blend toward black.
Practical recipe for geometry recovery (tools/demo_inverse.py):
soft_silhouette_eps ~ 1-2 pixel footprints of discriminant variation
(0.05 at 192px-wide renders of this scene), `image_l2_tonemapped` so the
~25x-brighter emissive pixels don't dominate, and `adam_eps` ~1e-3 so
occluded spheres' noise-level gradients don't random-walk.  Single-view
limits identifiability: fully/mostly occluded parameters stay at their
priors -- expected, not a defect.

Stochasticity: the per-pixel XorShift32 seed depends on the frame index
(tracecore.seed_pixels), so stepping `frame` each iteration gives a fresh
sample set -- Adam sees unbiased stochastic gradients of the expected
image, the same effect as re-sampling a minibatch.

Multi-chip: `make_sharded_value_and_grad` shards image rows over a Mesh
(pure DP, scene replicated) and psums loss + parameter gradients over ICI
-- the gradient all-reduce the north star asks for.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .config import RenderConfig
from .render import wavefront
from .scene import Scene

# Scene fields that carry gradients (the differentiable parameter set).
PARAM_FIELDS = ("center", "radius", "albedo", "emissive", "roughness", "ri")

# (major, minor) JAX versions on which the check_vma=False cotangent
# contract of the pallas+mesh gradient path was verified (see
# make_sharded_value_and_grad): with check_vma off, shard_map AD does NOT
# insert the replicated-input cotangent psum and the explicit psum below
# is required exactly once.  If a future JAX starts inserting it
# regardless, grads double-count by the mesh size -- the fast-gate test
# asserts the end result; this pin turns a silent behavior change into a
# loud warning.  Deliberately TIGHT (0.9 only): any newer minor is
# unverified by definition, so it must warn.
_CHECK_VMA_VERIFIED = ((0, 9), (0, 9))


def _check_vma_psum_contract():
    import warnings
    try:
        ver = tuple(int(p) for p in jax.__version__.split(".")[:2])
    except ValueError:  # pragma: no cover - exotic version strings
        return
    lo, hi = _CHECK_VMA_VERIFIED
    if not (lo <= ver <= hi):
        warnings.warn(
            f"jax {jax.__version__} is outside the range verified for the "
            "check_vma=False pallas+mesh gradient contract "
            f"({lo}..{hi}); run tests/test_sharding.py::"
            "test_sharded_pallas_grads_match_single_device to re-verify "
            "(an automatic replicated-cotangent psum would double-count "
            "gradients by the mesh size)", stacklevel=3)


def scene_grad_mask(scene: Scene, trainable: Sequence[str]) -> Scene:
    """A Scene-shaped pytree of 0/1 floats selecting trainable fields."""
    unknown = set(trainable) - set(PARAM_FIELDS)
    if unknown:
        raise ValueError(f"unknown trainable fields: {sorted(unknown)}")
    masks = {
        f: jnp.full_like(getattr(scene, f),
                         1.0 if f in trainable else 0.0)
        for f in PARAM_FIELDS
    }
    return scene.replace(**masks)


def _mask_grads(grads: Scene, mask: Scene) -> Scene:
    return grads.replace(**{
        f: getattr(grads, f) * getattr(mask, f) for f in PARAM_FIELDS
    })


def image_l2(img, target):
    """Mean squared pixel error (the inverse-rendering objective)."""
    d = img - target
    return jnp.mean(d * d)


def image_l2_tonemapped(img, target):
    """L2 on Reinhard-compressed radiance, x/(1+x).

    The scene's emissives are ~20-30x brighter than everything else; raw
    L2 lets a handful of light/reflection pixels (whose dependence on the
    geometry is the discontinuous kind the estimator does not model)
    dominate the objective.  Compression bounds any pixel's error at 1,
    making the smooth shading/silhouette terms the signal."""
    a = img / (1.0 + jnp.abs(img))
    b = target / (1.0 + jnp.abs(target))
    d = a - b
    return jnp.mean(d * d)


def render_loss(scene: Scene, target, cfg: RenderConfig, frame,
                loss_fn=image_l2, backend: str = "jnp",
                interpret: bool = False, lockstep_primal: bool = False):
    """Pixel loss of a differentiable single-frame render against `target`.

    backend="pallas" renders AND differentiates through the fused Pallas
    kernels (ops/pallas_grad.render_frame_pallas_diff): forward is the
    fast fused kernel, backward is the in-kernel-vjp gradient kernel --
    the per-bounce carries of the reverse sweep stay in VMEM instead of
    round-tripping HBM (the 3.8x fwd+bwd cliff of the XLA path).
    lockstep_primal=True makes the forward render the exact function the
    backward differentiates (consistent (value, grad) pair at lockstep
    forward speed; see render_frame_pallas_diff)."""
    if backend == "pallas":
        from .ops.pallas_grad import render_frame_pallas_diff
        img, _ = render_frame_pallas_diff(scene, cfg, frame,
                                          interpret, lockstep_primal)
    else:
        img, _ = wavefront.render_frame(scene, cfg, frame,
                                        differentiable=True)
    return loss_fn(img, target)


def multiview_render_loss(scene: Scene, cameras, targets,
                          cfg: RenderConfig, frame, loss_fn=image_l2,
                          backend: str = "jnp", interpret: bool = False,
                          lockstep_primal: bool = False):
    """Mean pixel loss over several (camera, target) views.

    Single-view geometry recovery is identifiability-limited: depth along
    the view ray and occluded parameters are unconstrained.  Extra views
    triangulate.  `cameras` is a static tuple of CameraSpec; each view
    renders `scene.replace(camera=cam)` (the camera is a static Scene
    field, so the views unroll at trace time -- with backend="pallas"
    each view gets its own fused forward + in-kernel-vjp gradient kernel
    instance, and the per-view scene cotangents sum through AD)."""
    total = jnp.float32(0.0)
    for cam, target in zip(cameras, targets):
        view = scene.replace(camera=cam)
        if backend == "pallas":
            from .ops.pallas_grad import render_frame_pallas_diff
            img, _ = render_frame_pallas_diff(view, cfg, frame,
                                              interpret, lockstep_primal)
        else:
            img, _ = wavefront.render_frame(view, cfg, frame,
                                            differentiable=True)
        total = total + loss_fn(img, target)
    return total / len(cameras)


def make_sharded_value_and_grad(cfg: RenderConfig, mesh: Mesh,
                                backend: str = "jnp",
                                interpret: bool = False,
                                cameras: Optional[tuple] = None):
    """value_and_grad of the pixel-L2 loss with image rows sharded over
    `mesh` and loss/grads psum-reduced over ICI.

    Per-shard loss is sum-of-squares / global pixel count, so the psum of
    shard losses equals the global mean and the psum of shard grads equals
    the global gradient.  Returns `f(scene, target, frame) -> (loss, grads)`
    (wrap in jit at the call site); `target` is (H, W, 3), or (V, H, W, 3)
    when `cameras` (a static tuple of V CameraSpec) is given -- each shard
    then renders its row band once per view (views unrolled, rows sharded)
    and the loss is the mean over views.

    backend="pallas": each shard renders AND differentiates its band with
    the fused Pallas kernels (ops/pallas_grad.render_tile_pallas_diff) --
    kernel-speed gradients composed with the mesh, the configuration the
    north star's gradient all-reduce asks for.  The scene cotangent psum
    over ICI is inserted by shard_map's AD (replicated input), exactly as
    in the jnp path.
    """
    if backend == "pallas":
        _check_vma_psum_contract()
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} must divide over {n} devices")
    rows_per = cfg.height // n
    n_views = 1 if cameras is None else len(cameras)
    denom = float(cfg.height * cfg.width * 3 * n_views)

    def band_image(scene, frame, y0):
        if backend == "pallas":
            from .ops.pallas_grad import render_tile_pallas_diff
            img, _ = render_tile_pallas_diff(scene, cfg, frame, 0, y0,
                                             rows_per, cfg.width, interpret)
        else:
            img, _ = wavefront.render_tile(scene, cfg, frame, 0, y0,
                                           rows_per, cfg.width,
                                           differentiable=True)
        return jnp.transpose(img, (1, 2, 0))

    def local_loss(scene, target_shard, frame, y0):
        if cameras is None:
            d = band_image(scene, frame, y0) - target_shard
            return jnp.sum(d * d) / denom
        total = jnp.float32(0.0)
        for v, cam in enumerate(cameras):
            d = band_image(scene.replace(camera=cam), frame, y0) \
                - target_shard[v]
            total = total + jnp.sum(d * d)
        return total / denom

    def shard_fn(scene, target_shard, frame):
        y0 = jax.lax.axis_index(axis) * rows_per
        loss, grads = jax.value_and_grad(local_loss)(scene, target_shard,
                                                     frame, y0)
        # jnp path: no explicit psum on grads -- shard_map's AD inserts
        # the psum for cotangents of replicated (in_specs P()) inputs
        # itself; an explicit one here double-counts by the mesh size
        # (measured: 8x on an 8-device mesh).  pallas path: check_vma is
        # OFF (pallas_call metadata limitation), which also disables the
        # varying-axes tracking that drives that automatic psum -- the
        # returned grads are the LOCAL band's (measured: sharded grads ==
        # shard-0 grads without this), so psum explicitly.  This split is
        # an undocumented JAX internal: _check_vma_psum_contract() pins
        # the version range it was verified on, and
        # tests/test_sharding.py::test_sharded_pallas_grads_match_single_device
        # (fast gate) asserts the end result every run.
        if backend == "pallas":
            grads = jax.lax.psum(grads, axis)
        # The loss is a per-shard partial sum and IS psum'd explicitly.
        return jax.lax.psum(loss, axis), grads

    target_spec = P(axis, None, None) if cameras is None \
        else P(None, axis, None, None)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), target_spec, P()),
        out_specs=(P(), P()),
        # check_vma=False on the pallas path for the same pallas_call
        # metadata limitation as mesh.render_frame_sharded; guarded by
        # tests/test_sharding.py's grad-equality tests.
        check_vma=(backend != "pallas"),
    )


@dataclasses.dataclass
class InverseRenderer:
    """Adam-on-pixel-L2 scene recovery (BASELINE.json config 3).

    Optimizes `trainable` Scene fields to match `target` (H, W, 3 linear
    radiance, layout as render_frame).  With `mesh` given, loss/grad are
    row-sharded across devices."""

    cfg: RenderConfig
    target: jax.Array  # (H, W, 3), or (V, H, W, 3) stacked when cameras set
    trainable: Tuple[str, ...] = ("center", "radius", "albedo", "emissive")
    learning_rate: float = 2e-2
    mesh: Optional[Mesh] = None
    loss_fn: Callable = image_l2
    clip_norm: Optional[float] = 1.0  # None disables gradient clipping
    # Multi-view: a static tuple of CameraSpec, one per target view (the
    # scene's own camera is ignored).  Triangulates geometry that a
    # single view cannot identify.  Combinable with mesh sharding (views
    # unrolled per shard, rows sharded) -- target becomes (V, H, W, 3).
    cameras: Optional[tuple] = None
    # Adam's denominator floor.  The default 1e-8 turns the near-zero,
    # noise-dominated gradients of barely-visible spheres into unit-scale
    # normalized steps (a pure random walk); a larger eps makes step size
    # proportional to gradient magnitude below that scale, pinning
    # unconstrained parameters in place.
    adam_eps: float = 1e-8
    # "jnp": reverse-mode XLA through the lockstep loop (jax.checkpoint).
    # "pallas": fused forward + fused in-kernel-vjp backward kernels
    # (ops/pallas_grad.py); composes with mesh (each shard runs the
    # gradient kernel on its row band, scene cotangents psum'd over ICI)
    # AND with cameras (views unroll -- one kernel instance per static
    # camera), so the full configuration of the north star exists:
    # multi-chip, multi-view, kernel-speed gradients.
    backend: str = "jnp"
    # interpret=True runs the Pallas kernels in interpret mode (CPU
    # testing of the backend="pallas" training step; no effect on jnp).
    interpret: bool = False
    # backend="pallas" only: render the loss's primal with the LOCKSTEP
    # kernel (the exact function the backward differentiates) instead of
    # the fused forward.  Default False: for Adam on L2 the ~1e-3
    # fused-vs-lockstep primal drift is noise-level and the fused
    # forward is faster; set True when the loss needs a consistent
    # (value, grad) pair (see ops/pallas_grad.render_frame_pallas_diff).
    # Supported single-view and multi-view; raises with mesh sharding
    # (the tile-level custom_vjp has no lockstep-primal variant).
    lockstep_primal: bool = False

    def __post_init__(self):
        adam = optax.adam(self.learning_rate, eps=self.adam_eps)
        self.opt = adam if self.clip_norm is None else optax.chain(
            optax.clip_by_global_norm(self.clip_norm), adam)
        if self.mesh is not None:
            if self.loss_fn is not image_l2:
                raise ValueError("mesh sharding implements image_l2 only "
                                 "(the per-shard partial sums assume it)")
            if self.lockstep_primal:
                # the sharded path's tile-level custom_vjp has no
                # lockstep-primal variant; silently ignoring the request
                # would hand back the fused primal the caller opted out of
                raise ValueError("lockstep_primal is not implemented for "
                                 "mesh-sharded training; drop mesh or "
                                 "lockstep_primal")
            self._vg = make_sharded_value_and_grad(
                self.cfg, self.mesh, backend=self.backend,
                interpret=self.interpret, cameras=self.cameras)
        elif self.cameras is not None:
            self._vg = jax.value_and_grad(
                lambda s, t, f: multiview_render_loss(
                    s, self.cameras, t, self.cfg, f, self.loss_fn,
                    self.backend, self.interpret, self.lockstep_primal))
        else:
            self._vg = jax.value_and_grad(
                lambda s, t, f: render_loss(s, t, self.cfg, f,
                                            self.loss_fn, self.backend,
                                            self.interpret,
                                            self.lockstep_primal))
        self._step = jax.jit(self._step_impl)

    def _step_impl(self, scene, opt_state, mask, frame):
        loss, grads = self._vg(scene, self.target, frame)
        grads = _mask_grads(grads, mask)
        updates, opt_state = self.opt.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    def fit(self, scene: Scene, steps: int, frame0: int = 0,
            resample: bool = True, callback: Optional[Callable] = None):
        """Run `steps` Adam iterations from `scene`.

        resample=True: a fresh per-pixel sample set each step (frame0+i
        seeds the RNG) -- unbiased stochastic gradients of the expected
        image, but the loss has a Monte-Carlo noise floor vs a target
        rendered from a different sample set.  resample=False: keep the
        target's own frame -- deterministic optimization whose loss can
        reach ~0 (use when the target was rendered by this framework at
        `frame0`).  Returns (optimized scene, list of losses)."""
        mask = scene_grad_mask(scene, self.trainable)
        opt_state = self.opt.init(scene)
        losses = []
        for i in range(steps):
            frame = frame0 + i if resample else frame0
            scene, opt_state, loss = self._step(
                scene, opt_state, mask, jnp.int32(frame))
            losses.append(loss)
            if callback is not None:
                callback(i, loss, scene)
        return scene, [float(l) for l in losses]
