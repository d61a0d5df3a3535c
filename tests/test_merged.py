"""Merged-traversal (software-pipelined) wavefront tests (round 4).

cfg.merged_wavefront=True carries each ray's nearest-hit (t, id) one
iteration ahead so one sphere loop answers the next ray's argmin AND the
bounce's NEE shadow occlusions (tracecore.render_pixels_fused_merged,
-422 census ops/iteration).  Contracts asserted here:

  * per-lane RNG streams and ray counts are IDENTICAL to the unmerged
    loop -> ray counts match EXACTLY and (on XLA-CPU, where both loops
    compile to the same per-lane arithmetic) images are bit-equal;
  * jnp-merged and Pallas-merged are BIT-IDENTICAL (the same production
    contract the unmerged paths ship with);
  * pix_per_lane, tile padding (count_bounds), and shard_map composition
    all hold under the merged loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toypathtracer_tpu import RenderConfig
from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
from toypathtracer_tpu.render.wavefront import render_frame

CFG = RenderConfig(width=128, height=16, samples_per_pixel=2, max_depth=10,
                   tile_h=8, tile_w=128)
CFG_M = CFG.replace(merged_wavefront=True)


def test_merged_matches_unmerged_jnp(big_scene):
    """Ray counts exact; pixel values at worst cross-formulation drift
    (measured bit-equal on XLA-CPU: the pipeline re-schedules iterations
    but every per-lane expression chain is unchanged)."""
    a, ra = render_frame(big_scene, CFG, jnp.int32(3))
    b, rb = render_frame(big_scene, CFG_M, jnp.int32(3))
    assert int(ra) == int(rb)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() < 0.02
    assert (a == b).mean() > 0.5


def test_merged_pallas_matches_merged_jnp_bitexact(big_scene):
    img_j, rc_j = render_frame(big_scene, CFG_M, jnp.int32(3))
    img_p, rc_p = render_frame_pallas(big_scene, CFG_M, jnp.int32(3),
                                      interpret=True)
    assert int(rc_j) == int(rc_p)
    np.testing.assert_array_equal(np.asarray(img_j), np.asarray(img_p))


def test_merged_pix_per_lane_bit_identical(big_scene):
    """K-pixel lanes compose with the pipeline: image/rays bit-identical
    to K=1 merged (and thus to the unmerged chain)."""
    cfg1 = RenderConfig(width=128, height=48, samples_per_pixel=2,
                        max_depth=6, tile_h=16, tile_w=128,
                        merged_wavefront=True)
    a, ra = render_frame_pallas(big_scene, cfg1, jnp.int32(5),
                                interpret=True)
    b, rb = render_frame_pallas(big_scene, cfg1.replace(pix_per_lane=2),
                                jnp.int32(5), interpret=True)
    assert int(ra) == int(rb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merged_padded_counts_exact(big_scene):
    """Tile padding under the merged loop: per-iteration count masking
    attributes every ray to its pre-refill slot's pixel, so padded
    pixels stay excluded exactly."""
    for w, h, th, k in ((100, 16, 16, 2), (128, 20, 16, 2)):
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=1,
                           max_depth=4, tile_h=th, tile_w=128,
                           pix_per_lane=k, merged_wavefront=True)
        img_j, rc_j = render_frame(big_scene, cfg, jnp.int32(2))
        img_p, rc_p = render_frame_pallas(big_scene, cfg, jnp.int32(2),
                                          interpret=True)
        assert int(rc_j) == int(rc_p), (w, h, th, k)
        np.testing.assert_array_equal(np.asarray(img_j), np.asarray(img_p))


def test_merged_sharded_bit_identical(big_scene):
    """Merged kernel inside shard_map shards == single-device merged."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    from toypathtracer_tpu.parallel.mesh import (make_mesh,
                                                 render_frame_sharded_pallas)
    mesh = make_mesh()
    img1, rays1 = render_frame_pallas(big_scene, CFG_M, jnp.int32(1),
                                      interpret=True)
    imgn, raysn = render_frame_sharded_pallas(big_scene, CFG_M,
                                              jnp.int32(1), mesh,
                                              interpret=True)
    assert int(rays1) == int(raysn)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(imgn))


def test_merged_no_light_sampling(big_scene):
    """cfg.do_light_sampling=False exercises the n_l == 0 branch of the
    pipelined body (no cones, no shadow block)."""
    cfg = CFG.replace(do_light_sampling=False)
    a, ra = render_frame(big_scene, cfg, jnp.int32(2))
    b, rb = render_frame(big_scene, cfg.replace(merged_wavefront=True),
                         jnp.int32(2))
    assert int(ra) == int(rb)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() < 0.02


# ---------------------------------------------------------------------------
# Round 5: the merged traversal ported to the DIFFERENTIABLE lockstep loop
# (tracecore.trace merged_diff route / bounce_parts_merged).

MCFG_D = RenderConfig(width=64, height=8, samples_per_pixel=1, max_depth=4)
MCFG_DM = MCFG_D.replace(merged_wavefront=True)


def test_merged_diff_primal_matches_unmerged_diff(big_scene):
    """Differentiable merged vs unmerged lockstep: same per-lane
    expressions (merged_traversal is term-for-term the split traversals),
    so ray counts are EXACT and primals agree to contraction drift."""
    a, ra = render_frame(big_scene, MCFG_D, jnp.int32(3),
                         differentiable=True)
    b, rb = render_frame(big_scene, MCFG_DM, jnp.int32(3),
                         differentiable=True)
    assert int(ra) == int(rb)
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-5
    assert (a == b).mean() > 0.9


def test_merged_diff_grads_match_unmerged(big_scene):
    """jax.grad through the merged differentiable route == through the
    unmerged lockstep, all six parameter arrays (finite and allclose;
    value-identical formulations can still drift by compiler contraction,
    amplified ~10x through the depth-4 backward)."""
    def make_loss(cfg):
        def loss(s):
            img, _ = render_frame(s, cfg, jnp.int32(2),
                                  differentiable=True)
            return jnp.mean(img)
        return loss

    ga = jax.jit(jax.grad(make_loss(MCFG_D)))(big_scene)
    gb = jax.jit(jax.grad(make_loss(MCFG_DM)))(big_scene)
    for f in ("center", "radius", "albedo", "emissive", "roughness", "ri"):
        x = np.asarray(getattr(ga, f))
        y = np.asarray(getattr(gb, f))
        assert np.isfinite(y).all(), f"{f}: non-finite merged grad"
        err = np.abs(x - y).max()
        scale = np.abs(x).max() + 1e-12
        assert err / scale < 1e-3, f"{f}: rel err {err / scale}"
    # gradients actually flow (not trivially zero)
    assert np.abs(np.asarray(gb.center)).max() > 0


def test_merged_diff_grad_kernel_matches_jax_grad(small_scene):
    """The fused Pallas gradient kernel under cfg.merged_wavefront routes
    its in-kernel trace through bounce_parts_merged (unrolled
    merged_traversal, safe sqrt): cotangents must equal jax.grad of the
    jnp merged differentiable path."""
    from toypathtracer_tpu.ops.pallas_grad import (
        render_tile_grad_pallas, scene_cotangent_from_packed)

    cfg = RenderConfig(width=16, height=8, samples_per_pixel=2, max_depth=3,
                       grad_tile_h=8, grad_tile_w=16, tile_h=8, tile_w=16,
                       merged_wavefront=True)
    key = np.random.RandomState(1)
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
