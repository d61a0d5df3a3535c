"""Wavefront (GPU-semantics) renderer tests: determinism, progressive
accumulation semantics, animation, cross-semantics convergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from toypathtracer_tpu import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from toypathtracer_tpu.render import frame as frame_mod
from toypathtracer_tpu.render.wavefront import render_frame

CFG = RenderConfig(width=64, height=36)


def test_render_deterministic(big_scene):
    a, ra = render_frame(big_scene, CFG, jnp.int32(3))
    b, rb = render_frame(big_scene, CFG, jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ra) == int(rb)


def test_frames_differ(big_scene):
    a, _ = render_frame(big_scene, CFG, jnp.int32(0))
    b, _ = render_frame(big_scene, CFG, jnp.int32(1))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


def test_output_shape_and_finite(big_scene):
    img, rays = render_frame(big_scene, CFG, jnp.int32(0))
    a = np.asarray(img)
    assert a.shape == (36, 64, 3)
    assert np.isfinite(a).all()
    assert a.min() >= 0.0
    # every pixel got light from somewhere (sky minimum is ~0.15*0.3 scaled)
    assert a.max() > 1.0  # emissive visible
    # ray count: >= 1 primary per sample, <= (1 primary + depth + shadows)
    n_samples = 36 * 64 * CFG.samples_per_pixel
    assert int(rays) >= n_samples
    assert int(rays) <= n_samples * (CFG.max_depth * 3 + 1)


def test_ray_count_close_to_reference_scale(big_scene):
    # reference oracle at 64x36 frame 0 counts ~42.5k rays (tests/golden);
    # GPU sampler paths differ slightly but must be within a few percent.
    _, rays = render_frame(big_scene, CFG, jnp.int32(0))
    assert abs(int(rays) - 42536) / 42536 < 0.05


def test_progressive_blend_matches_formula(big_scene):
    state = frame_mod.init_frame_state(CFG)
    s1, img1, _ = frame_mod.progressive_step(
        state, big_scene, jnp.float32(0.0), CFG, FLAG_PROGRESSIVE)
    # materialize before the next step: the state is donated and the
    # returned image aliases its accumulator (progressive_step docstring)
    img1 = np.asarray(img1)
    s2, img2, _ = frame_mod.progressive_step(
        s1, big_scene, jnp.float32(0.0), CFG, FLAG_PROGRESSIVE)
    f0, _ = render_frame(big_scene, CFG, jnp.int32(0))
    f1, _ = render_frame(big_scene, CFG, jnp.int32(1))
    # frame 0: lerpFac = 0 -> img1 == f0 ; frame 1: 0.5*f0 + 0.5*f1
    np.testing.assert_allclose(img1, np.asarray(f0), atol=1e-6)
    want = 0.5 * np.asarray(f0) + 0.5 * np.asarray(f1)
    np.testing.assert_allclose(np.asarray(img2), want, atol=1e-5)
    assert int(s2.frame) == 2


def test_progressive_step_donation():
    """The accumulation round-trip is donated (the reference's ping-pong
    texture pair, TestWin.cpp:285-297): the lowered module marks the
    incoming FrameState buffers as donors, so on TPU the blend reuses the
    previous accumulator's HBM instead of allocating per frame."""
    from toypathtracer_tpu import make_scene
    scene = make_scene(big=False)
    state = frame_mod.init_frame_state(CFG)
    lowered = frame_mod.progressive_step.lower(
        state, scene, jnp.float32(0.0), CFG, FLAG_PROGRESSIVE, None)
    txt = lowered.as_text()
    # the (H, W, 3) accumulator input must carry a donation annotation
    assert ("tf.aliasing_output" in txt) or ("jax.buffer_donor" in txt), \
        "no donation annotation in lowered progressive_step"


def test_non_progressive_no_blend(big_scene):
    state = frame_mod.init_frame_state(CFG)
    s1, img1, _ = frame_mod.progressive_step(
        state, big_scene, jnp.float32(0.0), CFG, 0)
    del img1  # aliases the donated chain; not inspected here
    s2, img2, _ = frame_mod.progressive_step(
        s1, big_scene, jnp.float32(0.0), CFG, 0)
    f1, _ = render_frame(big_scene, CFG, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(img2), np.asarray(f1), atol=1e-6)


def test_animate_moves_spheres(big_scene):
    t = jnp.float32(1.0)
    s = big_scene.animate(t)
    a = np.asarray(s.center)
    b = np.asarray(big_scene.center)
    # sphere 1: y = cos(t)+1 ; sphere 8: z = sin(t)*0.3 (Test.cpp:304-308)
    np.testing.assert_allclose(a[1, 1], np.cos(1.0) + 1.0, rtol=1e-6)
    np.testing.assert_allclose(a[8, 2], np.sin(1.0) * 0.3, rtol=1e-6)
    # everything else untouched
    mask = np.ones_like(a, bool)
    mask[1, 1] = mask[8, 2] = False
    np.testing.assert_array_equal(a[mask], b[mask])


def test_animate_smoothing_lerp(big_scene):
    state = frame_mod.FrameState(
        accum=jnp.ones((36, 64, 3), jnp.float32), frame=jnp.int32(4))
    fac = frame_mod.lerp_factor(state.frame, FLAG_PROGRESSIVE | FLAG_ANIMATE,
                                CFG)
    np.testing.assert_allclose(float(fac), (4 / 5) * 0.9, rtol=1e-6)


def test_small_scene_renders(small_scene):
    img, rays = render_frame(small_scene, CFG, jnp.int32(0))
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert small_scene.n_spheres == 9
    assert small_scene.emissive_ids == (8,)


def test_mitsuba_compare_mode(small_scene):
    """Mitsuba mode: constant sky, zero aperture, metal roughness forced 0
    (reference: Test.cpp:226-227, 312-313, 143-145)."""
    from toypathtracer_tpu.scene import make_scene
    cfg = RenderConfig(width=64, height=36, do_mitsuba_compare=True)
    scene = make_scene(big=False, mitsuba_compare=True)
    assert scene.camera.aperture == 0.0
    img, _ = render_frame(scene, cfg, jnp.int32(0))
    assert np.isfinite(np.asarray(img)).all()


def test_fused_equals_lockstep(big_scene):
    """The persistent-wavefront (fused) sample loop runs the same per-lane
    op sequence as the lockstep spp loop: ray counts (and hence RNG
    consumption and bounce structure) must match EXACTLY.  Pixel values
    agree only to ~1e-3: XLA codegen (FMA contraction / fusion) differs
    between the two loop bodies, so last-ulp differences amplify through
    the bounce chain -- verified empirically that inputs to each bounce
    are bit-identical while outputs drift."""
    import jax
    from toypathtracer_tpu.camera import make_camera
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    cfg = RenderConfig(width=64, height=16, samples_per_pixel=4,
                       max_depth=10)
    port = ArrayScenePort(big_scene)
    cam = make_camera(big_scene.camera, cfg.width / cfg.height)
    yy = jax.lax.broadcasted_iota(jnp.int32, (16, 64), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (16, 64), 1)

    cl, rl = jax.jit(lambda: tc.render_pixels_lockstep(
        port, cfg, cam, xx, yy, jnp.int32(5)))()
    cf, rf = jax.jit(lambda: tc.render_pixels_fused(
        port, cfg, cam, xx, yy, jnp.int32(5)))()
    np.testing.assert_array_equal(np.asarray(rl), np.asarray(rf))
    for a, b in zip(cl, cf):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 0.02, np.abs(a - b).max()
        # the overwhelming majority of lanes are bit-equal
        assert (a == b).mean() > 0.5


def test_gpu_vs_cpu_semantics_converge(big_scene):
    """The wavefront (GPU-sampler) and parity (CPU-sampler) renderers are
    different estimators of the same integral: their multi-frame means must
    agree block-wise."""
    from toypathtracer_tpu.render.parity import render_frame_parity
    # 64x36 on purpose: the same cfg as tests/test_parity.py, so the
    # (very compile-heavy) parity renderer program is reused from the
    # in-process jit cache when the suite runs together.
    cfg = RenderConfig(width=64, height=36)
    n = 6
    acc_w = np.zeros((36, 64, 3))
    acc_p = np.zeros((36, 64, 3))
    for f in range(n):
        w, _ = render_frame(big_scene, cfg, jnp.int32(f))
        p, _ = render_frame_parity(big_scene, cfg, jnp.int32(f))
        acc_w += np.asarray(w)
        acc_p += np.asarray(p)
    ta = np.sqrt(np.clip(acc_w / n, 0, None))
    tb = np.sqrt(np.clip(acc_p / n, 0, None))
    ab = ta.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    bb = tb.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    assert np.abs(ab - bb).mean() < 0.03, np.abs(ab - bb).mean()


def test_branch_skip_matches_straight_line(big_scene):
    """Whole-tile branch skipping (lax.cond on any-lane masks) must not
    change results: skip placeholders are never selected.  Exercises the
    cond path explicitly since the production default is off
    (TPT_SKIP_EMPTY; see tracecore._SKIP_EMPTY).  Colors compare at tight
    tolerance, not bitwise: XLA fuses/FMA-contracts the branch body
    differently inside a cond region (measured ~6e-6 rel); ray counts are
    integer decisions and must match exactly."""
    import jax.numpy as jnp
    import numpy as np
    from toypathtracer_tpu.camera import make_camera
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    cfg = RenderConfig(width=48, height=16, samples_per_pixel=2, max_depth=4)
    port = ArrayScenePort(big_scene)
    cam = make_camera(big_scene.camera, cfg.width / cfg.height)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width),
                          indexing="ij")
    a_col, a_cnt = tc.render_pixels_fused(port, cfg, cam, xx, yy,
                                          jnp.int32(2), skip_empty=False)
    b_col, b_cnt = tc.render_pixels_fused(port, cfg, cam, xx, yy,
                                          jnp.int32(2), skip_empty=True)
    np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(b_cnt))
    for a, b in zip(a_col, b_col):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_render_session_validates_user_scenes(big_scene):
    """RenderSession is the host-side seam every user scene passes
    through (CLI, viewer, direct API): scene.validate_scene must warn
    when an emissive sphere's surface is embedded in another sphere (the
    configuration where the fast kernels' interval-overlap shadow test
    darkens NEE, tracecore._occ_test docstring) -- and must stay silent
    on the shipped scenes."""
    import warnings

    tiny = RenderConfig(width=16, height=8, samples_per_pixel=1,
                        max_depth=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frame_mod.RenderSession(big_scene, tiny)
    assert not [x for x in w if "overlaps" in str(x.message)]

    # move the first emissive light to sit inside sphere 2's volume
    e = big_scene.emissive_ids[0]
    c = np.asarray(big_scene.center).copy()
    c[e] = c[2]
    bad = big_scene.replace(center=jnp.asarray(c))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frame_mod.RenderSession(bad, tiny)
    assert [x for x in w if "overlaps" in str(x.message)], \
        [str(x.message) for x in w]


def test_progressive_steps_per_frame_counts_no_int32_wrap(big_scene):
    """progressive_steps returns PER-FRAME int32 counts and sum_rays
    totals them on host in int64 -- exact even when the total exceeds
    int32 (round-4 advisor finding: a fused on-device int32 sum wrapped
    silently for large n x resolution x spp, e.g. 64 fused 4K frames)."""
    from toypathtracer_tpu.render.frame import (init_frame_state,
                                                progressive_steps, sum_rays)

    cfg = RenderConfig(width=8, height=4, samples_per_pixel=1, max_depth=2)
    per_frame = 2 ** 30  # 4 of these overflow int32

    def fake_render(scene, cfg_, frame):
        return (jnp.zeros((cfg_.height, cfg_.width, 3), jnp.float32),
                jnp.int32(per_frame))

    st = init_frame_state(cfg)
    st, img, rays = progressive_steps(st, big_scene, jnp.float32(0.0), cfg,
                                      FLAG_PROGRESSIVE, fake_render, 4)
    assert rays.shape == (4,)
    assert sum_rays(rays) == 4 * per_frame  # > 2**31 - 1
    # scalar (single-step) counts keep working through the same helper
    assert sum_rays(jnp.int32(7)) == 7


def test_explicit_skip_empty_overrides_merged_route(big_scene):
    """cfg.merged_wavefront + an explicit skip_empty=True must fall back
    to the unmerged body (which implements the early-out) instead of
    silently dropping the request (round-4 advisor finding).  Ray counts
    exact; colors at cond-region fusion tolerance (see
    test_branch_skip_matches_straight_line)."""
    import jax.numpy as jnp
    import numpy as np
    from toypathtracer_tpu.camera import make_camera
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    cfg = RenderConfig(width=48, height=16, samples_per_pixel=2, max_depth=4,
                       merged_wavefront=True)
    port = ArrayScenePort(big_scene)
    cam = make_camera(big_scene.camera, cfg.width / cfg.height)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width),
                          indexing="ij")
    a_col, a_cnt = tc.render_pixels_fused(port, cfg, cam, xx, yy,
                                          jnp.int32(2), skip_empty=False)
    b_col, b_cnt = tc.render_pixels_fused(port, cfg, cam, xx, yy,
                                          jnp.int32(2), skip_empty=True)
    np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(b_cnt))
    for a, b in zip(a_col, b_col):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
