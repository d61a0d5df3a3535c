"""Analytic ground-truth validation (the independent-renderer axis).

The reference validates against Mitsuba renders of Mitsuba/scene.xml
(readme.md:15 "Part 4: Correctness fixes and Mitsuba").  Mitsuba cannot
be installed in this build environment (no package installs, zero
network egress; `tools/export_mitsuba.py` ships the scene translation
for anyone who can run it).  These tests substitute the one thing an
independent renderer provides -- ground truth that does NOT come from
this codebase -- with closed-form radiometry derived by hand and
independent numpy re-implementations:

  * furnace tests: for a CONVEX body under the constant
    (DO_MITSUBA_COMPARE) sky, no scattered or reflected ray can re-hit
    the body, so the iterative estimator is DETERMINISTIC:
    every Lambert path carries exactly albedo * sky and every
    roughness-0 metal path exactly albedo * sky.  One wrong factor
    (a pi, a cosine, a missing attenuation) shifts every pixel.
  * NEE direct lighting vs numpy quadrature: the cone-sampled explicit
    light estimator's expectation is integrated to ~1e-6 by midpoint
    quadrature over the (eps1, eps2) unit square using an independent
    numpy implementation of the reference's sampling geometry
    (Test.cpp:94-134), and compared against the rendered mean.
  * camera + sphere intersection vs an independent numpy ray tracer
    (thin-lens mapping re-derived from Maths.h:418-442, quadratic roots
    from the textbook formula rather than the -b trick).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toypathtracer_tpu import RenderConfig
from toypathtracer_tpu.render.wavefront import render_frame
from toypathtracer_tpu.scene import (CameraSpec, MAT_LAMBERT, MAT_METAL,
                                     Scene)

SKY_MITSUBA = np.array([0.15, 0.21, 0.3], np.float32)


def _one_sphere_scene(mat_type, albedo, center=(0.0, 0.0, 0.0), radius=1.0,
                      roughness=0.0, emissive=(0.0, 0.0, 0.0),
                      camera=None):
    n = 1
    return Scene(
        center=jnp.asarray([center], jnp.float32),
        radius=jnp.asarray([radius], jnp.float32),
        albedo=jnp.asarray([albedo], jnp.float32),
        emissive=jnp.asarray([emissive], jnp.float32),
        roughness=jnp.asarray([roughness], jnp.float32),
        ri=jnp.asarray([0.0], jnp.float32),
        mat_type=(mat_type,),
        emissive_ids=(),
        camera=camera or CameraSpec(look_from=(0.0, 0.0, 4.0),
                                    look_at=(0.0, 0.0, 0.0),
                                    aperture=0.0, focus_dist=4.0),
    )


def _np_camera_rays(cfg, spec):
    """Independent numpy thin-lens pixel-center rays (re-derived from the
    reference Camera, Maths.h:418-442; aperture 0).  y=0 = bottom row."""
    theta = np.deg2rad(spec.vfov)
    half_h = np.tan(theta / 2.0)
    half_w = (cfg.width / cfg.height) * half_h
    lf = np.array(spec.look_from, np.float64)
    la = np.array(spec.look_at, np.float64)
    vup = np.array(spec.vup, np.float64)
    w = lf - la
    w /= np.linalg.norm(w)
    u = np.cross(vup, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    llc = (lf - half_w * spec.focus_dist * u - half_h * spec.focus_dist * v
           - spec.focus_dist * w)
    horiz = 2 * half_w * spec.focus_dist * u
    vert = 2 * half_h * spec.focus_dist * v
    ys, xs = np.mgrid[0:cfg.height, 0:cfg.width]
    s = (xs + 0.5) / cfg.width
    t = (ys + 0.5) / cfg.height
    d = (llc[None, None] + s[..., None] * horiz + t[..., None] * vert - lf)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return lf, d


def _np_sphere_hit(ro, rd, center, radius):
    """Textbook quadratic (NOT the -b/ ray-unit shortcut): returns
    (t, hit_mask) for the nearest root > 0."""
    oc = ro[None, None] - np.array(center, np.float64)
    a = np.sum(rd * rd, axis=-1)
    b = 2.0 * np.sum(rd * oc, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4 * a * c
    hit = disc > 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    t = np.where(t0 > 1e-3, t0, t1)
    return t, hit & (t > 1e-3)


def test_lambert_furnace_exact():
    """Convex Lambert body under the constant sky: every path's radiance
    is EXACTLY albedo * sky (bounce 1: e=0, c=albedo; bounce 2: the
    cosine-sampled direction leaves the convex body, hits sky).  Zero
    Monte-Carlo variance -- per-pixel float tolerance only."""
    alb = (0.7, 0.5, 0.3)
    scene = _one_sphere_scene(MAT_LAMBERT, alb)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                       max_depth=4, do_mitsuba_compare=True,
                       do_light_sampling=False)
    img, _ = render_frame(scene, cfg, jnp.int32(0))
    a = np.asarray(img)
    expected = np.asarray(alb, np.float32) * SKY_MITSUBA
    # pixels through the sphere center region definitely hit
    hit_px = a[12:20, 12:20]
    np.testing.assert_allclose(hit_px, np.broadcast_to(expected,
                                                       hit_px.shape),
                               rtol=0, atol=2e-6)
    # corner pixels miss -> exactly the sky constant
    np.testing.assert_allclose(a[0, 0], SKY_MITSUBA, rtol=0, atol=2e-6)


def test_metal_furnace_exact():
    """Roughness-0 metal: mirror reflection off a convex body always
    leaves it, so every path is exactly albedo * sky."""
    alb = (0.9, 0.6, 0.2)
    scene = _one_sphere_scene(MAT_METAL, alb)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                       max_depth=4, do_mitsuba_compare=True,
                       do_light_sampling=False)
    img, _ = render_frame(scene, cfg, jnp.int32(0))
    a = np.asarray(img)
    expected = np.asarray(alb, np.float32) * SKY_MITSUBA
    hit_px = a[12:20, 12:20]
    np.testing.assert_allclose(hit_px, np.broadcast_to(expected,
                                                       hit_px.shape),
                               rtol=0, atol=2e-6)


def test_hit_geometry_matches_independent_numpy_tracer():
    """hit_spheres' nearest-hit t for the camera rays of a 1-sphere
    scene vs an independent numpy quadratic -- catches camera-mapping
    and intersection errors against non-shared math."""
    from toypathtracer_tpu.camera import make_camera
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    scene = _one_sphere_scene(MAT_LAMBERT, (0.5, 0.5, 0.5),
                              center=(0.3, -0.2, 0.4), radius=0.8)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=1,
                       max_depth=2)
    port = ArrayScenePort(scene)
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width),
                          indexing="ij")
    # pixel-center rays, aperture 0: u=(x+0.5)/w, v=(y+0.5)/h
    u = (xx.astype(jnp.float32) + 0.5) / cfg.width
    v = (yy.astype(jnp.float32) + 0.5) / cfg.height
    state = jnp.full(xx.shape, 1, jnp.uint32)
    _, ro, rd = tc.camera_get_ray(cam, u, v, state)
    res = tc.hit_spheres(port, ro, rd, cfg.min_t, cfg.max_t)

    ro_np, rd_np = _np_camera_rays(cfg, scene.camera)
    t_np, hit_np = _np_sphere_hit(ro_np, rd_np, (0.3, -0.2, 0.4), 0.8)
    got_hit = np.asarray(res.hit_id) >= 0
    np.testing.assert_array_equal(got_hit, hit_np)
    np.testing.assert_allclose(np.asarray(res.t)[hit_np], t_np[hit_np],
                               rtol=1e-5)


def test_nee_direct_light_matches_quadrature():
    """Explicit-light-sampling expectation vs independent numpy midpoint
    quadrature of the reference's cone estimator (Test.cpp:94-134):
    E[lightE] = (alb*em/pi) * omega * E_cone[max(0, l . nl)], integrated
    over the (eps1, eps2) unit square with the geometry recomputed in
    float64 numpy.  max_depth=1 isolates lightE (matE=0, no deeper
    bounce contributes)."""
    alb = (0.8, 0.8, 0.8)
    light_c = np.array([0.0, 1.5, -1.0])
    light_r = 0.3
    cam = CameraSpec(look_from=(0.0, 0.5, 2.0), look_at=(0.0, -0.5, -1.0),
                     aperture=0.0, focus_dist=3.0)
    scene = Scene(
        center=jnp.asarray([[0.0, -100.5, -1.0], light_c], jnp.float32),
        radius=jnp.asarray([100.0, light_r], jnp.float32),
        albedo=jnp.asarray([alb, (0.5, 0.5, 0.5)], jnp.float32),
        emissive=jnp.asarray([(0, 0, 0), (20.0, 15.0, 10.0)], jnp.float32),
        roughness=jnp.zeros(2, jnp.float32),
        ri=jnp.zeros(2, jnp.float32),
        mat_type=(MAT_LAMBERT, MAT_LAMBERT),
        emissive_ids=(1,),
        camera=cam,
    )
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=4,
                       max_depth=1, do_mitsuba_compare=True)

    frames = 32

    @jax.jit
    def mean_render(scene):
        def step(acc, i):
            img, _ = render_frame(scene, cfg, i)
            return acc + img, None
        acc, _ = jax.lax.scan(step, jnp.zeros((cfg.height, cfg.width, 3)),
                              jnp.arange(frames, dtype=jnp.int32))
        return acc / frames

    mean = np.asarray(mean_render(scene))

    # Independent numpy expectation of the PATCH mean: jittered pixel
    # samples over a patch are uniform over its (u, v) rectangle, so the
    # rendered patch mean estimates the area average of E[lightE] --
    # integrate that with a midpoint grid of hit positions x a midpoint
    # grid over the cone's (eps1, eps2) square, all float64.
    # y=0 is the BOTTOM image row; keep the patch in the lower half so
    # it sees only floor (the light sphere sits in the upper rows)
    y0p, y1p, x0p, x1p = 2, 8, 4, 12
    mean_patch = mean[y0p:y1p, x0p:x1p].reshape(-1, 3)

    theta = np.deg2rad(cam.vfov)
    half_h = np.tan(theta / 2.0)
    half_w = (cfg.width / cfg.height) * half_h
    lf = np.array(cam.look_from, np.float64)
    la = np.array(cam.look_at, np.float64)
    w = lf - la
    w /= np.linalg.norm(w)
    u_ax = np.cross(np.array([0.0, 1.0, 0.0]), w)
    u_ax /= np.linalg.norm(u_ax)
    v_ax = np.cross(w, u_ax)
    llc = (lf - half_w * cam.focus_dist * u_ax
           - half_h * cam.focus_dist * v_ax - cam.focus_dist * w)
    horiz = 2 * half_w * cam.focus_dist * u_ax
    vert = 2 * half_h * cam.focus_dist * v_ax

    m = 24  # position samples per pixel axis
    su_grid = (np.arange((x1p - x0p) * m) + 0.5) / m + x0p
    tv_grid = (np.arange((y1p - y0p) * m) + 0.5) / m + y0p
    s = su_grid / cfg.width
    t = tv_grid / cfg.height
    d = (llc[None, None] + s[None, :, None] * horiz
         + t[:, None, None] * vert - lf)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro_b = np.broadcast_to(lf, d.shape)
    t_fl, hit_fl = _np_sphere_hit(lf, d, (0.0, -100.5, -1.0), 100.0)
    t_li, hit_li = _np_sphere_hit(lf, d, light_c, light_r)
    floor_first = hit_fl & (~hit_li | (t_fl < t_li))
    assert floor_first.all(), "patch must see only floor for a clean bound"
    pos = ro_b + d * t_fl[..., None]
    nrm = (pos - np.array([0.0, -100.5, -1.0])) / 100.0
    nl = np.where((np.sum(nrm * d, axis=-1) < 0)[..., None], nrm, -nrm)

    sw = light_c - pos
    d2 = np.sum(sw * sw, axis=-1)
    sw = sw / np.sqrt(d2)[..., None]
    up = np.where((np.abs(sw[..., 0]) > 0.01)[..., None],
                  np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    su = np.cross(up, sw)
    su /= np.linalg.norm(su, axis=-1, keepdims=True)
    sv = np.cross(sw, su)
    cos_a_max = np.sqrt(np.maximum(0.0, 1.0 - light_r ** 2 / d2))
    omega = 2 * np.pi * (1.0 - cos_a_max)

    q = 100  # cone quadrature per axis
    e1 = ((np.arange(q) + 0.5) / q)[:, None]
    e2 = ((np.arange(q) + 0.5) / q)[None, :]
    cos_a = 1.0 - e1 + e1 * cos_a_max[..., None, None]
    sin_a = np.sqrt(np.maximum(0.0, 1.0 - cos_a ** 2))
    phi = 2 * np.pi * e2
    # l . nl expanded on the (su, sv, sw) frame to avoid a huge 6-D array
    su_nl = np.sum(su * nl, axis=-1)[..., None, None]
    sv_nl = np.sum(sv * nl, axis=-1)[..., None, None]
    sw_nl = np.sum(sw * nl, axis=-1)[..., None, None]
    cos_term = np.maximum(0.0, np.cos(phi) * sin_a * su_nl
                          + np.sin(phi) * sin_a * sv_nl + cos_a * sw_nl)
    mean_cos = cos_term.mean(axis=(-2, -1))
    per_pos = omega * mean_cos  # (H*m, W*m)
    expected_scalar = per_pos.mean()
    expected = (np.array(alb) * np.array([20.0, 15.0, 10.0]) / np.pi
                * expected_scalar)
    got = mean_patch.mean(axis=0)
    np.testing.assert_allclose(got, expected, rtol=0.02)


def test_dielectric_scatter_matches_independent_numpy():
    """The dielectric branch (the most regression-prone material --
    SURVEY 'hard parts': invRadius-signed normals, inside/outside test,
    Schlick gating) vs an independent float64 numpy implementation of
    the reference's scatter (Test.cpp:151-186): Snell refraction
    direction, total-internal-reflection fallback, and the Schlick
    probability, over a grid of incidence angles and both entering and
    exiting rays."""
    from toypathtracer_tpu.ops import tracecore as tc

    ri = 1.5
    rng = np.random.RandomState(7)
    angles = np.linspace(0.05, np.pi - 0.05, 41)  # vs +y normal
    normal_np = np.array([0.0, 1.0, 0.0])

    def np_scatter(rd, rr):
        """Reference semantics in float64 numpy (independent impl)."""
        rdn = rd @ normal_np
        entering = rdn <= 0.0
        outward = normal_np if entering else -normal_np
        nint = 1.0 / ri if entering else ri
        cosine = -rdn if entering else ri * rdn
        dt = rd @ outward
        discr = 1.0 - nint * nint * (1.0 - dt * dt)
        if discr > 0.0:
            refr = nint * (rd - outward * dt) - outward * np.sqrt(discr)
            r0 = ((1.0 - ri) / (1.0 + ri)) ** 2
            prob = r0 + (1.0 - r0) * min(max(1.0 - cosine, 0.0), 1.0) ** 5
        else:
            refr = None
            prob = 1.0
        refl = rd - 2.0 * (rd @ normal_np) * normal_np
        out = refl if rr < prob else refr
        return out / np.linalg.norm(out), prob

    shape = (len(angles),)
    rd = np.stack([np.sin(angles), -np.cos(angles), np.zeros(shape)], 0)
    # angles > pi/2 give rays moving AWAY from the surface along +y ->
    # the 'exiting' branch (rdn > 0), exactly the inside-the-sphere case
    state = jnp.asarray(rng.randint(1, 2**31, shape).astype(np.uint32))
    refl = tc.reflect3(tuple(jnp.asarray(r) for r in rd),
                       (jnp.zeros(shape), jnp.ones(shape),
                        jnp.zeros(shape)))
    st, out = tc._scatter_dielectric(
        state, tuple(jnp.asarray(r) for r in rd),
        (jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape)),
        refl, jnp.full(shape, ri, jnp.float32))
    out = np.stack([np.asarray(o) for o in out], 0)

    # replicate the single RNG draw to know which branch each lane took
    _, rr = tc.rand01(state)
    rr = np.asarray(rr)

    for k in range(len(angles)):
        expect, prob = np_scatter(rd[:, k].astype(np.float64),
                                  float(rr[k]))
        got = out[:, k]
        np.testing.assert_allclose(got, expect, rtol=0, atol=5e-6,
                                   err_msg=f"angle {angles[k]:.3f} "
                                           f"rr={rr[k]:.3f} prob={prob:.3f}")
