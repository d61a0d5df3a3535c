"""Animation-path gradients (BASELINE config 4): the reference's animation
mutates sphere 1 (y = cos t + 1) and sphere 8 (z = 0.3 sin t)
(reference: Test.cpp:304-308).  The motion parameter is the time scalar;
d(image)/d(t) must flow through Scene.animate into the renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_motion_ad_matches_fd_with_soft_visibility():
    """d(image)/dt of the reference animation (spheres 1 and 8 moving,
    Test.cpp:304-308) via AD with the two-sided soft-silhouette + NEE
    shadow-boundary estimators, against central finite differences of the
    EXPECTED image.  This is the round-1 "shading-only" known-limitation
    test rewritten as required: with soft_silhouette_eps > 0 the AD
    gradient carries the visibility-boundary terms and lands within tens
    of percent of FD.

    Method: FD of a fixed-seed stochastic render is dominated by discrete
    per-sample branch flips, so both sides average over F independent
    RNG streams (frame indices).  All quantities are deterministic (fixed
    seeds, fixed frame set) -- the measured rel-err at this exact config
    is 0.288 (and 0.262 with F=48/eps=0.02; depth-4/F=48 measures 0.266,
    see tools/measure_motion_grad.py); the gate below is margin over
    cross-version float drift, not over randomness.  The hard estimator
    at this config leaves AD at roughly HALF of FD (visibility missing);
    0.40 cleanly separates fixed from broken."""
    from toypathtracer_tpu.scene import make_scene
    big_scene = make_scene(big=True)
    cfg = RenderConfig(width=96, height=32, samples_per_pixel=2,
                       max_depth=2, soft_silhouette_eps=0.02)
    t_at, eps_t, frames = 0.7, 0.05, 32

    def mean_img(t, f):
        s = scene_for_frame(big_scene, t, FLAG_ANIMATE)
        img, _ = render_frame(s, cfg, f, differentiable=True)
        return jnp.mean(img)

    f_jit = jax.jit(mean_img)
    g_jit = jax.jit(jax.grad(mean_img))
    ad, fp, fm = 0.0, 0.0, 0.0
    for fr in range(frames):
        fi = jnp.int32(fr)
        ad += float(g_jit(jnp.float32(t_at), fi))
        fp += float(f_jit(jnp.float32(t_at + eps_t), fi))
        fm += float(f_jit(jnp.float32(t_at - eps_t), fi))
    ad /= frames
    fd = (fp - fm) / (2 * eps_t * frames)
    assert np.isfinite(ad) and np.isfinite(fd)
    assert np.sign(ad) == np.sign(fd)
    rel = abs(ad - fd) / abs(fd)
    assert rel < 0.40, f"AD {ad:+.4e} vs FD {fd:+.4e}: rel err {rel:.3f}"


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
