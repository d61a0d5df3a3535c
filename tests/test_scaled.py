"""Scaled-scene (config 5) tests: procedural instancing, Morton chunking,
AABB-culled traversal correctness.

Chunk culling must be EXACT: a chunk is skipped only when its AABB entry
distance cannot beat the current best hit, so a 1-chunk (brute force)
render of the same sphere set must match bit-for-bit."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from toypathtracer_tpu import RenderConfig
from toypathtracer_tpu.scaled import (
    ChunkedScenePort, make_scaled_scene, render_frame_scaled)

CFG = RenderConfig(width=48, height=16, samples_per_pixel=1, max_depth=3)
N = 800


def test_scaled_scene_build():
    s = make_scaled_scene(n=N, chunk=128)
    n_pad = s.center.shape[0]
    assert n_pad % 128 == 0 and n_pad >= N
    assert s.chunk_aabb.shape == (n_pad // 128, 6)
    # AABBs actually bound their spheres
    c = np.asarray(s.center).reshape(-1, 128, 3)
    r = np.asarray(s.radius).reshape(-1, 128)
    aabb = np.asarray(s.chunk_aabb)
    assert (c - r[..., None] >= aabb[:, None, :3] - 1e-4).all()
    assert (c + r[..., None] <= aabb[:, None, 3:] + 1e-4).all()
    # emissive beacons present and static
    assert s.emissive_ids == tuple(range(8))
    assert (np.asarray(s.emissive)[:8] > 0).any(axis=1).all()


def test_scaled_render_finite_and_lit():
    s = make_scaled_scene(n=N, chunk=128)
    img, rays = render_frame_scaled(s, CFG, jnp.int32(0))
    a = np.asarray(img)
    assert a.shape == (16, 48, 3)
    assert np.isfinite(a).all()
    assert a.max() > 0.05  # something visible
    assert int(rays) >= 16 * 48  # at least one ray per pixel


def test_chunk_culling_is_exact():
    """Culled multi-chunk traversal == single-chunk brute force, bitwise."""
    s_many = make_scaled_scene(n=N, chunk=128)
    s_one = make_scaled_scene(n=N, chunk=1024)  # >= n -> 1 chunk
    assert s_one.n_chunks == 1
    img_m, rays_m = render_frame_scaled(s_many, CFG, jnp.int32(1))
    img_o, rays_o = render_frame_scaled(s_one, CFG, jnp.int32(1))
    assert int(rays_m) == int(rays_o)
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_o))


def test_chunked_port_shadow_query():
    s = make_scaled_scene(n=N, chunk=128)
    port = ChunkedScenePort(s)
    shape = (4, 8)
    ro = tuple(jnp.zeros(shape) for _ in range(3))
    rd = (jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape))  # straight up
    res = port.hit_chunks(ro, rd, 0.001, 1e7, want_material=False)
    assert res.hit_id.shape == shape


def test_fused_lights_visible_matches_per_light_hit():
    """The one-scan fused shadow query must agree with per-light full
    traversal (`hit_chunks(...).hit_id == light`) -- equivalent except on
    exact float ties at the light distance (none in a random scene)."""
    import jax.numpy as jnp
    from toypathtracer_tpu.scaled import ChunkedScenePort, make_scaled_scene

    scene = make_scaled_scene(n=800, chunk=64, extent=30.0)
    port = ChunkedScenePort(scene)
    rng = np.random.default_rng(3)
    n = 512
    ro = tuple(jnp.asarray(rng.uniform(-25, 25, n), jnp.float32)
               for _ in range(3))
    lights = list(scene.emissive_ids)[:4]
    t_min, t_max = 1e-3, 1e7

    dirs = []
    for e in lights:
        sp = port.sphere(e)
        d = (sp.cx - ro[0] + rng.normal(0, 2, n).astype(np.float32),
             sp.cy - ro[1] + rng.normal(0, 2, n).astype(np.float32),
             sp.cz - ro[2] + rng.normal(0, 2, n).astype(np.float32))
        norm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
        dirs.append(tuple(x / norm for x in d))

    fused = port.lights_visible(ro, dirs, lights, t_min, t_max)
    for e, l, got in zip(lights, dirs, fused):
        ref = port.hit_chunks(ro, l, t_min, t_max,
                              want_material=False).hit_id == e
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_traversal_matches_scan():
    """The Pallas chunk-traversal kernel (interpret mode) must return
    exactly the scan path's (t, id) for identical rays."""
    import jax.numpy as jnp
    from toypathtracer_tpu.scaled import ChunkedScenePort, make_scaled_scene
    from toypathtracer_tpu.ops.scaled_pallas import hit_chunks_tiles

    from toypathtracer_tpu.ops.scaled_pallas import LANE_TILE
    lanes = (2,) + LANE_TILE
    scene = make_scaled_scene(n=3000, chunk=256, extent=40.0)
    port_p = ChunkedScenePort(scene, use_pallas=True, pallas_interpret=True)
    port_j = ChunkedScenePort(scene)
    rng = np.random.default_rng(5)
    ro = tuple(jnp.asarray(rng.uniform(-30, 30, lanes), jnp.float32)
               for _ in range(3))
    d = tuple(jnp.asarray(rng.normal(size=lanes), jnp.float32)
              for _ in range(3))
    norm = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
    rd = tuple(x / norm for x in d)

    ht, hid = hit_chunks_tiles(port_p._packed, ro, rd, chunk=256,
                               t_min=1e-3, t_max=1e7, interpret=True)
    ref = port_j.hit_chunks(ro, rd, 1e-3, 1e7, want_material=False)
    np.testing.assert_array_equal(np.asarray(ref.hit_id), np.asarray(hid))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(ht))
    assert int((np.asarray(hid) >= 0).sum()) > 0


def test_scaled_render_differentiable():
    """Config 5 + gradients: reverse mode through the chunked traversal
    (scan + cond packet skips + argmin/gather winner fetch).  Albedo
    gradients are smooth in interior configurations, so AD must match FD
    through the FULL chunked render, and geometry/emissive gradients must
    be finite and nonzero."""
    import jax

    s = make_scaled_scene(n=2000, chunk=64, extent=40.0)
    cfg = RenderConfig(width=32, height=8, samples_per_pixel=1, max_depth=3)

    def loss(scene):
        img, _ = render_frame_scaled(scene, cfg, jnp.int32(0),
                                     differentiable=True)
        return jnp.mean(img)

    # allow_int: the ScaledScene pytree carries bool material masks
    # (float0 cotangents, ignored below)
    g = jax.jit(jax.grad(loss, allow_int=True))(s)
    for name in ("center", "radius", "albedo", "emissive", "roughness"):
        arr = np.asarray(getattr(g, name))
        assert np.isfinite(arr).all(), f"{name}: non-finite grads"
    assert (np.asarray(g.albedo) != 0).any()
    assert (np.asarray(g.center) != 0).any()

    # FD check on the albedo of the sphere AD says matters most (smooth
    # parameter -- no visibility discontinuity involved).
    ga = np.asarray(g.albedo)
    i, c = np.unravel_index(np.abs(ga).argmax(), ga.shape)
    eps = 1e-2
    f = jax.jit(lambda scene: loss(scene))

    def nudged(sign):
        alb = s.albedo.at[i, c].add(sign * eps)
        return dataclasses.replace(s, albedo=alb)

    fd = (float(f(nudged(+1))) - float(f(nudged(-1)))) / (2 * eps)
    assert abs(fd - ga[i, c]) / (abs(fd) + 1e-12) < 5e-2, (fd, ga[i, c])


def test_pallas_shadow_kernel_matches_scan():
    """The fused-shadow kernel's occlusion bitmask (interpret mode) must
    reproduce the jnp per-light chunk scan exactly."""
    import jax.numpy as jnp
    from toypathtracer_tpu.scaled import ChunkedScenePort, make_scaled_scene
    from toypathtracer_tpu.ops.scaled_pallas import LANE_TILE

    lanes = (2,) + LANE_TILE
    scene = make_scaled_scene(n=3000, chunk=256, extent=40.0)
    pp = ChunkedScenePort(scene, use_pallas=True, pallas_interpret=True)
    pj = ChunkedScenePort(scene)
    rng = np.random.default_rng(3)
    ro = tuple(jnp.asarray(rng.uniform(-30, 30, lanes), jnp.float32)
               for _ in range(3))
    lights = list(scene.emissive_ids)[:4]
    dirs = []
    for e in lights:
        sp = pp.sphere(e)
        d = (sp.cx - ro[0] + rng.normal(0, 2, lanes).astype(np.float32),
             sp.cy - ro[1] + rng.normal(0, 2, lanes).astype(np.float32),
             sp.cz - ro[2] + rng.normal(0, 2, lanes).astype(np.float32))
        norm = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        dirs.append(tuple(x / norm for x in d))

    a = pp.lights_visible(ro, dirs, lights, 1e-3, 1e7)
    b = pj.lights_visible(ro, dirs, lights, 1e-3, 1e7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scaled_silhouette_chunks_matches_unrolled():
    """The chunk-scan silhouette query (round-2 VERDICT item 4) must agree
    with the unrolled tracecore.silhouette_query wherever the conservative
    AABB pruning keeps the candidate: hit-side discriminants exactly, and
    miss-side discriminants exactly whenever the true max is within the
    gradient-visible band (d >= -8*eps); pruned lanes may only differ
    where both weights are sigmoid(-8)-negligible."""
    import jax
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.scene import Scene, CameraSpec, MAT_LAMBERT
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    eps = 0.05
    scene = make_scaled_scene(n=200, chunk=64, extent=20.0)
    port_c = ChunkedScenePort(scene)

    # unrolled reference port over the same (padded) sphere set
    n_pad = scene.center.shape[0]
    mt = np.where(np.asarray(scene.mat_is_met), 1,
                  np.where(np.asarray(scene.mat_is_die), 2, 0))
    ref_scene = Scene(
        center=scene.center, radius=scene.radius, albedo=scene.albedo,
        emissive=scene.emissive, roughness=scene.roughness, ri=scene.ri,
        mat_type=tuple(int(x) for x in mt),
        emissive_ids=scene.emissive_ids, camera=scene.camera)
    port_u = ArrayScenePort(ref_scene)

    rng = np.random.default_rng(11)
    shape = (8, 16)
    ro = tuple(jnp.asarray(rng.uniform(-15, 15, shape), jnp.float32)
               for _ in range(3))
    d = tuple(jnp.asarray(rng.normal(size=shape), jnp.float32)
              for _ in range(3))
    norm = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
    rd = tuple(x / norm for x in d)
    hit = tc.hit_spheres(port_c, ro, rd, 1e-3, 1e7, want_material=False)

    q_c = port_c.silhouette_chunks(ro, rd, 1e-3, hit.hit_id, eps)
    q_u = tc.silhouette_query(port_u, ro, rd, 1e-3, hit.hit_id)

    # allclose, not equality: the chunk scan compiles as one fused
    # program (FMA contraction) while the unrolled query dispatches
    # op-by-op, and d = nb^2 - c amplifies the ulp drift by cancellation
    # (nb^2 ~ 3600 at this scene scale -> |drift| up to ~2e-4)
    d_c, d_u = np.asarray(q_c.d), np.asarray(q_u.d)
    hid = np.asarray(hit.hit_id)
    np.testing.assert_allclose(d_c[hid >= 0], d_u[hid >= 0],
                               rtol=1e-4, atol=2e-3)
    visible_band = (hid < 0) & (d_u >= -8.0 * eps)
    assert visible_band.any()  # the test must exercise the band
    np.testing.assert_allclose(d_c[visible_band], d_u[visible_band],
                               rtol=1e-4, atol=2e-3)
    # everywhere else both silhouette weights are negligible
    w_c = 1.0 / (1.0 + np.exp(-d_c / eps))
    w_u = 1.0 / (1.0 + np.exp(-d_u / eps))
    assert np.abs(w_c - w_u).max() < 5e-3
    # candidate attributes agree on the visible band
    np.testing.assert_array_equal(np.asarray(q_c.cx)[visible_band],
                                  np.asarray(q_u.cx)[visible_band])
    np.testing.assert_array_equal(np.asarray(q_c.radius)[visible_band],
                                  np.asarray(q_u.radius)[visible_band])


def test_scaled_lights_occlusion_proximity_matches_unrolled():
    """Chunked shadow-boundary proximity vs the unrolled reference: exact
    wherever the occluder discriminant is in the gradient-visible band."""
    from toypathtracer_tpu.ops import tracecore as tc
    from toypathtracer_tpu.scene import Scene
    from toypathtracer_tpu.render.wavefront import ArrayScenePort

    scene = make_scaled_scene(n=200, chunk=64, extent=20.0)
    port_c = ChunkedScenePort(scene)
    mt = np.where(np.asarray(scene.mat_is_met), 1,
                  np.where(np.asarray(scene.mat_is_die), 2, 0))
    ref_scene = Scene(
        center=scene.center, radius=scene.radius, albedo=scene.albedo,
        emissive=scene.emissive, roughness=scene.roughness, ri=scene.ri,
        mat_type=tuple(int(x) for x in mt),
        emissive_ids=scene.emissive_ids, camera=scene.camera)
    port_u = ArrayScenePort(ref_scene)

    rng = np.random.default_rng(3)
    shape = (8, 16)
    pos = tuple(jnp.asarray(rng.uniform(-15, 15, shape), jnp.float32)
                for _ in range(3))
    lids = list(scene.emissive_ids[:3])
    dirs, t_ls = [], []
    for e in lids:
        sp = port_c.sphere(e)
        to_l = (sp.cx - pos[0], sp.cy - pos[1], sp.cz - pos[2])
        n = jnp.sqrt(to_l[0] ** 2 + to_l[1] ** 2 + to_l[2] ** 2)
        l = tuple(x / n for x in to_l)
        dirs.append(l)
        t_ls.append(tc._sphere_t(sp, pos, l, 1e-3, safe=False)[0])

    d_c = port_c.lights_occlusion_proximity(pos, dirs, lids, 1e-3, t_ls)
    d_u = tc._lights_occlusion_proximity(port_u, pos, dirs, lids, 1e-3,
                                         t_ls)
    for a, b in zip(d_c, d_u):
        a, b = np.asarray(a), np.asarray(b)
        band = b >= -8.0
        assert band.any()
        np.testing.assert_allclose(a[band], b[band], rtol=1e-4, atol=2e-3)


@pytest.mark.slow
def test_scaled_geometry_recovery_soft_silhouette():
    """Round-2 VERDICT item 4's done-criterion: recover a perturbed sphere
    CENTER through the chunked renderer (config 5 + config 3 combined) --
    soft_silhouette_eps > 0 now works with ChunkedScenePort, and the
    silhouette gradients it restores pull the sphere home.

    Setup: a 2k-sphere scaled field with one sphere relocated to a
    prominent spot AGAINST THE SKY (radius 3 -> ~100 px footprint at
    96x24; the procedural field's 0.2-0.5-radius spheres are sub-pixel at
    this scene scale, which makes their positions unidentifiable -- moving
    them changes fractions of one pixel and Adam just random-walks).
    Sky-silhouetted placement matters: the estimator softens the
    hit<->miss boundary (blending hit radiance vs sky/tangent estimate);
    a sphere silhouetted against OTHER GEOMETRY is a hit<->hit boundary
    it does not model (measured: wrong-sign gradients against the field,
    sign+magnitude agreement with FD against the sky -- ~25% on all 3
    axes at this setup).  soft_silhouette_eps is in DISCRIMINANT units:
    d ~ 2*r*(r - b) near the silhouette, so eps=1.0 gives the sigmoid a
    reach of ~0.2 units of closest-approach distance at r=3."""
    import dataclasses as dc
    import jax
    import optax
    from toypathtracer_tpu.scaled import refresh_chunk_aabb

    base = make_scaled_scene(n=2000, chunk=64, extent=40.0)
    sid = len(base.emissive_ids)  # first non-light sphere
    scene = refresh_chunk_aabb(dc.replace(
        base,
        center=base.center.at[sid].set(jnp.asarray([0.0, 10.0, 5.0])),
        radius=base.radius.at[sid].set(3.0)))
    cfg = RenderConfig(width=96, height=24, samples_per_pixel=1,
                       max_depth=2, soft_silhouette_eps=1.0)

    target, _ = render_frame_scaled(scene, cfg, jnp.int32(0),
                                    differentiable=True)
    target = jax.lax.stop_gradient(target)

    true_c = np.asarray(scene.center[sid])
    delta0 = jnp.asarray([0.4, 0.2, 0.3], jnp.float32)
    onehot = jnp.zeros_like(scene.center).at[sid].set(1.0)

    def loss(center):
        s = refresh_chunk_aabb(dc.replace(scene, center=center))
        img, _ = render_frame_scaled(s, cfg, jnp.int32(0),
                                     differentiable=True)
        d = img - target
        return jnp.mean(d * d)

    opt = optax.adam(3e-2)

    @jax.jit
    def step(center, opt_state):
        l, g = jax.value_and_grad(loss)(center)
        upd, opt_state = opt.update(g * onehot, opt_state)
        return center + upd, opt_state, l

    center = scene.center.at[sid].add(delta0)
    err0 = float(jnp.linalg.norm(delta0))
    opt_state = opt.init(center)
    losses = []
    for _ in range(60):
        center, opt_state, l = step(center, opt_state)
        losses.append(float(l))
    err = float(np.linalg.norm(np.asarray(center[sid]) - true_c))
    assert err < 0.4 * err0, (err, err0, losses[:3], losses[-3:])
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])


def test_scaled_animation_beacon_orbit():
    """ScaledScene.animate (round 5): the emissive beacons orbit, the
    field stays static, every sphere stays inside its REFRESHED chunk
    AABB (hit_chunks' pruning-exactness invariant), and the animated
    frame renders finite and visibly different."""
    s = make_scaled_scene(n=N, chunk=128, extent=30.0)
    sa = s.animate(jnp.float32(1.3))
    nl = len(s.emissive_ids)
    assert not np.allclose(np.asarray(sa.center[:nl]),
                           np.asarray(s.center[:nl]))
    np.testing.assert_array_equal(np.asarray(sa.center[nl:]),
                                  np.asarray(s.center[nl:]))
    # orbit magnitude bounded by the documented 2x-radius XZ / 1x bob
    d = np.abs(np.asarray(sa.center[:nl] - s.center[:nl]))
    amp = 2.0 * np.asarray(s.radius[:nl])[:, None]
    assert (d <= amp + 1e-5).all()
    # pruning exactness: spheres inside refreshed AABBs
    c = np.asarray(sa.center).reshape(-1, 128, 3)
    r = np.asarray(sa.radius).reshape(-1, 128)
    aabb = np.asarray(sa.chunk_aabb)
    assert (c - r[..., None] >= aabb[:, None, :3] - 1e-4).all()
    assert (c + r[..., None] <= aabb[:, None, 3:] + 1e-4).all()
    # animate is a pure function of the base scene (frame-indexable)
    sb = s.animate(jnp.float32(1.3))
    np.testing.assert_array_equal(np.asarray(sa.center),
                                  np.asarray(sb.center))
    # renders finite and differs from the static frame
    img0, _ = render_frame_scaled(s, CFG, jnp.int32(0))
    img1, _ = render_frame_scaled(sa, CFG, jnp.int32(0))
    a0, a1 = np.asarray(img0), np.asarray(img1)
    assert np.isfinite(a1).all()
    assert np.abs(a1 - a0).max() > 1e-3
