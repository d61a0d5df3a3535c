"""Soft-silhouette (edge-aware) gradient estimator tests.

Pathwise AD through hard hit/miss selects drops the visibility-boundary
term of d(pixel)/d(center) -- the dominant term when a perturbation moves
silhouettes (SURVEY.md section 7 "Gradients at discontinuities"; the
north star's "reparameterized/edge-aware" requirement).  With
RenderConfig.soft_silhouette_eps > 0 the differentiable renderer adds a
straight-through sigmoid surrogate (tracecore.bounce_parts soft=True):
forward image unchanged, backward carries sigma'(d_sil/eps) terms.

Controlled setup: ONE Lambert sphere against the gradient sky, camera
looking straight at it.  Shifting the sphere sideways changes the image
ONLY via silhouette + shading; the surrogate must (a) leave the forward
image bit-identical, (b) produce a gradient that points back toward the
true position, (c) let Adam actually recover the position -- none of
which hold for the hard estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toypathtracer_tpu as tpt
from toypathtracer_tpu.scene import MAT_LAMBERT, CameraSpec, Scene
from toypathtracer_tpu.render.wavefront import render_frame
from toypathtracer_tpu.inverse import InverseRenderer, image_l2

CFG_HARD = tpt.RenderConfig(width=64, height=40, samples_per_pixel=2,
                            max_depth=2, soft_silhouette_eps=0.0)
CFG_SOFT = CFG_HARD.replace(soft_silhouette_eps=0.05)


def one_sphere_scene(cx: float = 0.0) -> Scene:
    return Scene(
        center=jnp.array([[cx, 0.0, 0.0]], jnp.float32),
        radius=jnp.array([0.6], jnp.float32),
        albedo=jnp.array([[0.8, 0.3, 0.2]], jnp.float32),
        emissive=jnp.zeros((1, 3), jnp.float32),
        roughness=jnp.zeros((1,), jnp.float32),
        ri=jnp.zeros((1,), jnp.float32),
        mat_type=(MAT_LAMBERT,),
        emissive_ids=(),
        camera=CameraSpec(look_from=(0.0, 0.0, 3.0), look_at=(0.0, 0.0, 0.0),
                          aperture=0.0),
    )


@pytest.fixture(scope="module")
def target():
    img, _ = render_frame(one_sphere_scene(0.0), CFG_SOFT, jnp.int32(0),
                          differentiable=True)
    return jax.lax.stop_gradient(img)


def _loss(cfg, center, target):
    scene = one_sphere_scene(0.0).replace(center=center)
    img, _ = render_frame(scene, cfg, jnp.int32(0), differentiable=True)
    return image_l2(img, target)


def test_forward_image_unchanged_by_soft_eps():
    a, ra = render_frame(one_sphere_scene(0.17), CFG_HARD, jnp.int32(0),
                         differentiable=True)
    b, rb = render_frame(one_sphere_scene(0.17), CFG_SOFT, jnp.int32(0),
                         differentiable=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ra) == int(rb)


def test_soft_gradient_points_home(target):
    """Sphere shifted +x: d(loss)/d(cx) must be positive (move -x to
    reduce), and the silhouette term must dominate the hard estimator's."""
    shifted = jnp.array([[0.15, 0.0, 0.0]], jnp.float32)
    g_soft = jax.grad(lambda c: _loss(CFG_SOFT, c, target))(shifted)
    g_hard = jax.grad(lambda c: _loss(CFG_HARD, c, target))(shifted)
    assert float(g_soft[0, 0]) > 0.0
    # the surrogate adds boundary signal the hard estimator lacks
    assert abs(float(g_soft[0, 0])) > 3.0 * abs(float(g_hard[0, 0]))


def test_soft_recovers_center_hard_does_not(target):
    start = one_sphere_scene(0.15)
    err0 = 0.15

    inv_soft = InverseRenderer(CFG_SOFT, target, trainable=("center",),
                               learning_rate=5e-3)
    fit_soft, losses_soft = inv_soft.fit(start, steps=60, resample=False)
    err_soft = float(jnp.abs(fit_soft.center[0, 0]))

    assert err_soft < 0.5 * err0, f"soft estimator stalled at {err_soft}"
    assert losses_soft[-1] < 0.5 * losses_soft[0]

    inv_hard = InverseRenderer(CFG_HARD, target, trainable=("center",),
                               learning_rate=5e-3)
    fit_hard, _ = inv_hard.fit(start, steps=60, resample=False)
    err_hard = float(jnp.abs(fit_hard.center[0, 0]))
    # hard estimator has no silhouette signal: it cannot do better
    assert err_soft < err_hard


def test_multiview_recovers_depth_axis():
    """A front view cannot identify the along-ray (z) offset of the
    sphere; adding a side view triangulates it (inverse.multiview_render
    _loss / InverseRenderer(cameras=...))."""
    side_cam = CameraSpec(look_from=(3.0, 0.0, 0.0), look_at=(0.0, 0.0, 0.0),
                          aperture=0.0)
    front_cam = CameraSpec(look_from=(0.0, 0.0, 3.0),
                           look_at=(0.0, 0.0, 0.0), aperture=0.0)
    cams = (front_cam, side_cam)

    true_scene = one_sphere_scene(0.0)
    targets = []
    for cam in cams:
        img, _ = render_frame(true_scene.replace(camera=cam), CFG_SOFT,
                              jnp.int32(0), differentiable=True)
        targets.append(jax.lax.stop_gradient(img))
    targets = jnp.stack(targets)

    start = true_scene.replace(
        center=jnp.array([[0.0, 0.0, 0.12]], jnp.float32))  # depth offset
    inv = InverseRenderer(CFG_SOFT, targets, trainable=("center",),
                          learning_rate=5e-3, cameras=cams)
    fitted, losses = inv.fit(start, steps=60, resample=False)
    errz = float(jnp.abs(fitted.center[0, 2]))
    assert errz < 0.06, f"multi-view failed to recover depth: {errz}"
    assert losses[-1] < 0.5 * losses[0]
