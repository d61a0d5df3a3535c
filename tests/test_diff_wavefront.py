"""Differentiable WAVEFRONT route (round 5, cfg.diff_wavefront).

The merged persistent-wavefront loop driven by a fixed-bound fori_loop
with a whole-tile cond early-out, reverse-differentiable.  Contracts:

  * forward values/ray counts equal the forward merged wavefront (same
    body, same iteration schedule; the extra guarded iterations are
    identity);
  * ray counts equal the lockstep differentiable path EXACTLY (the
    wavefront contract), pixel values at cross-formulation drift;
  * gradients are finite, match the lockstep formulation's at drift
    tolerance, and FD-check on smooth parameters;
  * the Pallas gradient kernel inherits the route through
    render_pixels and stays gradient-equal to jax.grad of the jnp path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toypathtracer_tpu import RenderConfig
from toypathtracer_tpu.render.wavefront import render_frame

CFG_LOCK = RenderConfig(width=64, height=8, samples_per_pixel=2,
                        max_depth=6, merged_wavefront=True)
CFG_WF = CFG_LOCK.replace(diff_wavefront=True)


def test_forward_matches_fused_wavefront(big_scene):
    """differentiable=True through the wavefront route must reproduce
    the FORWARD merged wavefront: identical body, identical schedule
    (the guarded tail iterations are identity), so counts are exact and
    values bit-equal up to loop-structure compilation drift."""
    a, ra = render_frame(big_scene, CFG_WF, jnp.int32(3))
    b, rb = render_frame(big_scene, CFG_WF, jnp.int32(3),
                         differentiable=True)
    assert int(ra) == int(rb)
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-5
    assert (a == b).mean() > 0.9


def test_counts_exact_vs_lockstep(big_scene):
    """Wavefront and lockstep differentiable forms count the same rays
    EXACTLY (per-lane RNG/termination sequences are identical) and
    agree on pixel values at the documented cross-formulation drift."""
    a, ra = render_frame(big_scene, CFG_LOCK, jnp.int32(2),
                         differentiable=True)
    b, rb = render_frame(big_scene, CFG_WF, jnp.int32(2),
                         differentiable=True)
    assert int(ra) == int(rb)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-3


def test_grads_match_lockstep(big_scene):
    """jax.grad through the wavefront route vs the merged lockstep:
    value-identical per-sample math, different accumulation order ->
    drift-tolerance agreement on every parameter array."""
    def make_loss(cfg):
        def loss(s):
            img, _ = render_frame(s, cfg, jnp.int32(1),
                                  differentiable=True)
            return jnp.mean(img)
        return loss

    ga = jax.jit(jax.grad(make_loss(CFG_LOCK)))(big_scene)
    gb = jax.jit(jax.grad(make_loss(CFG_WF)))(big_scene)
    for f in ("center", "radius", "albedo", "emissive", "roughness", "ri"):
        x = np.asarray(getattr(ga, f))
        y = np.asarray(getattr(gb, f))
        assert np.isfinite(y).all(), f"{f}: non-finite wavefront grad"
        err = np.abs(x - y).max()
        scale = np.abs(x).max() + 1e-12
        assert err / scale < 5e-3, f"{f}: rel err {err / scale}"
    assert np.abs(np.asarray(gb.center)).max() > 0


def test_albedo_grad_matches_fd(big_scene):
    """FD agreement on a smooth parameter through the wavefront route
    (the independent correctness check, not just lockstep equality)."""
    def loss(s):
        img, _ = render_frame(s, CFG_WF, jnp.int32(0),
                              differentiable=True)
        return jnp.mean(img)

    loss_j = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(big_scene)
    i, c = 2, 0
    g_ad = float(np.asarray(g.albedo)[i, c])
    eps = 1e-3
    alb = big_scene.albedo

    def at(d):
        return float(loss_j(big_scene.replace(albedo=alb.at[i, c].add(d))))

    g_fd = (at(eps) - at(-eps)) / (2 * eps)
    assert g_ad != 0.0
    assert abs(g_ad - g_fd) <= 0.05 * abs(g_fd) + 1e-6, (g_ad, g_fd)


def test_grad_kernel_inherits_wavefront_route(small_scene):
    """The fused Pallas gradient kernel under cfg.diff_wavefront runs
    the wavefront trace in-kernel: cotangents must equal jax.grad of
    the jnp path routed the same way."""
    from toypathtracer_tpu.ops.pallas_grad import (
        render_tile_grad_pallas, scene_cotangent_from_packed)

    cfg = RenderConfig(width=16, height=8, samples_per_pixel=2,
                       max_depth=3, grad_tile_h=8, grad_tile_w=16,
                       tile_h=8, tile_w=16, merged_wavefront=True,
                       diff_wavefront=True)
    key = np.random.RandomState(2)
    w = jnp.asarray(key.rand(cfg.height, cfg.width, 3).astype(np.float32))

    def loss(s):
        img, _ = render_frame(s, cfg, jnp.int32(0), differentiable=True)
        return jnp.sum(img * w)

    g_ref = jax.grad(loss)(small_scene)
    _, _, d_packed = render_tile_grad_pallas(
        small_scene, cfg, jnp.int32(0), jnp.transpose(w, (2, 0, 1)),
        0, 0, cfg.height, cfg.width, interpret=True)
    g_pal = scene_cotangent_from_packed(small_scene, d_packed)
    for f in ("center", "radius", "albedo", "emissive", "roughness", "ri"):
        a = np.asarray(getattr(g_ref, f))
        b = np.asarray(getattr(g_pal, f))
        assert np.isfinite(b).all(), f"{f}: non-finite"
        err = np.abs(a - b).max()
        scale = np.abs(a).max() + 1e-12
        assert err / scale < 1e-3, f"{f}: rel err {err / scale}"


def test_sharded_wavefront_grads_match_single_device(big_scene):
    """The production multi-chip grad configuration with the wavefront
    route: shard_map'd value_and_grad (rows sharded, psum'd cotangents)
    must reproduce the single-device result."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    from toypathtracer_tpu.inverse import (make_sharded_value_and_grad,
                                           render_loss)
    from toypathtracer_tpu.parallel.mesh import make_mesh

    cfg = RenderConfig(width=64, height=16, samples_per_pixel=1,
                       max_depth=4, merged_wavefront=True,
                       diff_wavefront=True)
    mesh = make_mesh()
    target, _ = render_frame(big_scene, cfg, jnp.int32(0))
    target = jax.lax.stop_gradient(target)
    scene_p = big_scene.replace(center=big_scene.center + 0.03)

    loss1, grads1 = jax.jit(jax.value_and_grad(
        lambda s: render_loss(s, target, cfg, jnp.int32(1))))(scene_p)
    vg = jax.jit(make_sharded_value_and_grad(cfg, mesh))
    lossn, gradsn = vg(scene_p, target, jnp.int32(1))

    np.testing.assert_allclose(float(loss1), float(lossn), rtol=1e-6)
    for f in ("center", "radius", "albedo", "emissive"):
        np.testing.assert_allclose(
            np.asarray(getattr(grads1, f)), np.asarray(getattr(gradsn, f)),
            rtol=1e-4, atol=1e-7, err_msg=f)
