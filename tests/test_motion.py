"""Animation-path gradients (BASELINE config 4): the reference's animation
mutates sphere 1 (y = cos t + 1) and sphere 8 (z = 0.3 sin t)
(reference: Test.cpp:304-308).  The motion parameter is the time scalar;
d(image)/d(t) must flow through Scene.animate into the renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from toypathtracer_tpu import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from toypathtracer_tpu.render.frame import scene_for_frame
from toypathtracer_tpu.render.wavefront import render_frame

CFG = RenderConfig(width=64, height=16, samples_per_pixel=2, max_depth=4)


def _image_mean_at(big_scene, t):
    scene_t = scene_for_frame(big_scene, t, FLAG_ANIMATE)
    img, _ = render_frame(scene_t, CFG, jnp.int32(0), differentiable=True)
    return jnp.mean(img)


def test_motion_gradient_finite_and_nonzero(big_scene):
    g = jax.jit(jax.grad(lambda t: _image_mean_at(big_scene, t)))(
        jnp.float32(0.7))
    g = float(g)
    assert np.isfinite(g)
    assert g != 0.0


def test_motion_gradient_is_shading_only():
    """KNOWN LIMITATION, asserted so a future fix flips this test: the
    straight-through gradients differentiate only the *shading* component
    of motion; the *visibility* component (silhouettes sweeping pixels as
    spheres move) is a step function that select-based AD cannot see.
    Measured here: FD (captures both) is orders of magnitude larger than
    AD (shading only) for the big scene's animated spheres.  Proper
    visibility gradients need edge sampling / reparameterized estimators
    (SURVEY.md section 7 hard parts) -- when implemented, AD should come
    within tens of percent of FD and this test must be rewritten."""
    from toypathtracer_tpu.scene import make_scene
    big_scene = make_scene(big=True)
    f = jax.jit(lambda t: _image_mean_at(big_scene, t))
    g_ad = float(jax.jit(jax.grad(
        lambda t: _image_mean_at(big_scene, t)))(jnp.float32(0.7)))
    eps = 1e-2
    g_fd = (float(f(jnp.float32(0.7 + eps))) -
            float(f(jnp.float32(0.7 - eps)))) / (2 * eps)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    # AD sees a real (nonzero) shading gradient but misses visibility:
    assert g_ad != 0.0
    assert abs(g_ad) < abs(g_fd)


def test_animated_sequence_per_frame_fwd_bwd(big_scene):
    """Config 4 smoke: a short animated sequence where every frame runs
    forward + backward (gradients w.r.t. the full scene parameter set)."""
    grad_fn = jax.jit(jax.grad(
        lambda s, t, f: jnp.mean(render_frame(
            scene_for_frame(s, t, FLAG_ANIMATE | FLAG_PROGRESSIVE),
            CFG, f, differentiable=True)[0])))
    for i in range(3):
        g = grad_fn(big_scene, jnp.float32(i / 60.0), jnp.int32(i))
        assert np.isfinite(np.asarray(g.center)).all()
        assert np.isfinite(np.asarray(g.albedo)).all()
