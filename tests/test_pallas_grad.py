"""Backward Pallas kernel (ops/pallas_grad.py) vs jax.grad of the jnp path.

The kernel runs the ENTIRE value-and-gradient computation in one fused
Pallas program (forward lockstep trace + in-kernel jax.vjp, per-bounce
carries in VMEM); these tests pin it to `jax.grad` of the identical
lockstep jnp formulation (render_frame(..., differentiable=True)) in
interpret mode -- the same contract the forward kernel has in
tests/test_pallas.py.  Reference loop being differentiated:
Cpp/Windows/ComputeShader.hlsl:294-343 (SURVEY.md section 7 stage 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toypathtracer_tpu import RenderConfig, make_scene
from toypathtracer_tpu.ops.pallas_grad import (
    render_frame_pallas_diff, render_tile_grad_pallas,
    scene_cotangent_from_packed)
from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
from toypathtracer_tpu.render.wavefront import render_frame

FIELDS = ("center", "radius", "albedo", "emissive", "roughness", "ri")


def _jnp_grad(scene, cfg, w):
    def loss(s):
        img, _ = render_frame(s, cfg, jnp.int32(0), differentiable=True)
        return jnp.sum(img * w)
    return jax.grad(loss)(scene)


def _assert_scene_grads_close(g_ref, g_pal, rtol=1e-3):
    for name in FIELDS:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_pal, name))
        assert np.isfinite(b).all(), f"{name}: non-finite pallas grad"
        err = np.abs(a - b).max()
        scale = np.abs(a).max() + 1e-12
        assert err / scale < rtol, f"{name}: rel err {err / scale}"


@pytest.fixture(scope="module")
def cfg():
    # Single grad tile (8, 16): the kernel's accumulation init path.
    return RenderConfig(width=16, height=8, samples_per_pixel=2, max_depth=3,
                        grad_tile_h=8, grad_tile_w=16, tile_h=8, tile_w=16)


@pytest.fixture(scope="module")
def cotangent(cfg):
    key = np.random.RandomState(0)
    return jnp.asarray(
        key.rand(cfg.height, cfg.width, 3).astype(np.float32))


def test_grad_kernel_matches_jax_grad(small_scene, cfg, cotangent):
    """Scene cotangents from the fused kernel == jax.grad of the jnp
    lockstep path, all six parameter arrays."""
    g_ref = _jnp_grad(small_scene, cfg, cotangent)
    _, _, d_packed = render_tile_grad_pallas(
        small_scene, cfg, jnp.int32(0),
        jnp.transpose(cotangent, (2, 0, 1)), 0, 0,
        cfg.height, cfg.width, interpret=True)
    g_pal = scene_cotangent_from_packed(small_scene, d_packed)
    _assert_scene_grads_close(g_ref, g_pal)


def test_grad_kernel_multi_tile_and_padding(small_scene):
    """A 2x2 grid with ragged width: cross-tile SMEM accumulation and the
    zero-padded cotangent must together reproduce the single-tile grad."""
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=1, max_depth=2,
                       grad_tile_h=8, grad_tile_w=16)
    key = np.random.RandomState(1)
    w = jnp.asarray(key.rand(cfg.height, cfg.width, 3).astype(np.float32))
    g_ref = _jnp_grad(small_scene, cfg, w)
    img, rays, d_packed = render_tile_grad_pallas(
        small_scene, cfg, jnp.int32(0), jnp.transpose(w, (2, 0, 1)), 0, 0,
        cfg.height, cfg.width, interpret=True)
    g_pal = scene_cotangent_from_packed(small_scene, d_packed)
    _assert_scene_grads_close(g_ref, g_pal)
    # the kernel's primal is the same lockstep formulation
    ref_img, ref_rays = render_frame(small_scene, cfg, jnp.int32(0),
                                     differentiable=True)
    np.testing.assert_allclose(np.asarray(img),
                               np.transpose(np.asarray(ref_img), (2, 0, 1)),
                               atol=1e-5)
    assert int(rays) == int(ref_rays)


def test_grad_kernel_with_soft_silhouette(small_scene, cotangent):
    """soft_silhouette_eps > 0 adds the two-sided silhouette + NEE
    shadow-boundary estimators to the differentiable path; the in-kernel
    vjp must reproduce jax.grad of the jnp path with them enabled (the
    inverse-rendering geometry/motion configuration)."""
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=2, max_depth=3,
                       grad_tile_h=8, grad_tile_w=16, tile_h=8, tile_w=16,
                       soft_silhouette_eps=0.02)
    g_ref = _jnp_grad(small_scene, cfg, cotangent)
    _, _, d_packed = render_tile_grad_pallas(
        small_scene, cfg, jnp.int32(0),
        jnp.transpose(cotangent, (2, 0, 1)), 0, 0,
        cfg.height, cfg.width, interpret=True)
    g_pal = scene_cotangent_from_packed(small_scene, d_packed)
    _assert_scene_grads_close(g_ref, g_pal)
    # the soft estimator must actually fire: center grads differ from the
    # hard-select configuration
    cfg_hard = cfg.replace(soft_silhouette_eps=0.0)
    g_hard = _jnp_grad(small_scene, cfg_hard, cotangent)
    assert np.abs(np.asarray(g_hard.center)
                  - np.asarray(g_ref.center)).max() > 0


def test_custom_vjp_entry_point(small_scene, cfg, cotangent):
    """render_frame_pallas_diff: primal == fused forward kernel, backward
    == the gradient kernel (drop-in for the inverse-rendering loss)."""
    img, rays = render_frame_pallas_diff(small_scene, cfg, jnp.int32(0),
                                         interpret=True)
    ref_img, ref_rays = render_frame_pallas(small_scene, cfg, jnp.int32(0),
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    assert int(rays) == int(ref_rays)

    def loss(s):
        im, _ = render_frame_pallas_diff(s, cfg, jnp.int32(0),
                                         interpret=True)
        return jnp.sum(im * cotangent)

    g = jax.grad(loss)(small_scene)
    g_ref = _jnp_grad(small_scene, cfg, cotangent)
    _assert_scene_grads_close(g_ref, g)


def test_inverse_renderer_pallas_backend(small_scene, cfg):
    """InverseRenderer(backend="pallas"): the production inverse-rendering
    step through the fused forward + in-kernel-vjp backward kernels
    (interpret mode here; Mosaic-compiled on the real chip).  An albedo
    perturbation must optimize back toward the target."""
    import jax.numpy as jnp
    from toypathtracer_tpu.inverse import InverseRenderer
    from toypathtracer_tpu.render.wavefront import render_frame

    target, _ = render_frame(small_scene, cfg, jnp.int32(0),
                             differentiable=True)
    target = jax.lax.stop_gradient(target)
    start = small_scene.replace(
        albedo=jnp.clip(small_scene.albedo * 0.6 + 0.1, 0.0, 1.0))

    inv = InverseRenderer(cfg, target, trainable=("albedo",),
                          learning_rate=0.05, backend="pallas",
                          interpret=True)
    fitted, losses = inv.fit(start, steps=6, resample=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    err0 = float(jnp.abs(start.albedo - small_scene.albedo).mean())
    err1 = float(jnp.abs(fitted.albedo - small_scene.albedo).mean())
    assert err1 < err0


def test_fused_vs_lockstep_primal_drift(big_scene):
    """Bound the custom_vjp primal/gradient formulation mismatch: the
    fused forward (the default primal of render_frame_pallas_diff) vs the
    lockstep formulation (the function the backward differentiates) at a
    representative inverse-rendering size.  The documented contract is
    ~1e-3 max per-pixel drift (render_pixels_fused docstring); this pins
    it so a regression (e.g. an op reorder that de-syncs the RNG) fails
    loudly instead of silently corrupting (value, grad) pairs."""
    cfg = RenderConfig(width=128, height=32, samples_per_pixel=2,
                       max_depth=6)
    fused, r_f = render_frame(big_scene, cfg, jnp.int32(0))
    lock, r_l = render_frame(big_scene, cfg, jnp.int32(0),
                             differentiable=True)
    assert int(r_f) == int(r_l)  # identical per-lane RNG/ray sequences
    diff = np.abs(np.asarray(fused) - np.asarray(lock))
    assert diff.max() < 2e-3, diff.max()
    assert diff.mean() < 2e-5, diff.mean()


def test_lockstep_primal_knob_consistent_pair(small_scene, cfg, cotangent):
    """render_frame_pallas_diff(lockstep_primal=True) must return the
    EXACT primal of the gradient formulation: bit-equal to the gradient
    kernel's own forward image, with unchanged gradients."""
    img_g, rays_g, _ = render_tile_grad_pallas(
        small_scene, cfg, jnp.int32(0),
        jnp.transpose(cotangent, (2, 0, 1)), 0, 0,
        cfg.height, cfg.width, interpret=True)

    def loss(s):
        img, rays = render_frame_pallas_diff(s, cfg, jnp.int32(0), True,
                                             True)
        return jnp.sum(img * cotangent), (img, rays)

    (val, (img, rays)), grads = jax.value_and_grad(loss, has_aux=True)(
        small_scene)
    np.testing.assert_array_equal(
        np.asarray(img), np.transpose(np.asarray(img_g), (1, 2, 0)))
    assert int(rays) == int(rays_g)
    # gradients are the same backward kernel regardless of the knob
    def loss_fused(s):
        img, _ = render_frame_pallas_diff(s, cfg, jnp.int32(0), True,
                                          False)
        return jnp.sum(img * cotangent)
    g_fused = jax.grad(loss_fused)(small_scene)
    for f in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(grads, f)),
                                      np.asarray(getattr(g_fused, f)))
