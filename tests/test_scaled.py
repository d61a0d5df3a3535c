"""Scaled-scene (config 5) tests: procedural instancing, Morton chunking,
AABB-culled traversal correctness.

Chunk culling must be EXACT: a chunk is skipped only when its AABB entry
distance cannot beat the current best hit, so a 1-chunk (brute force)
render of the same sphere set must match bit-for-bit."""

import dataclasses

import jax.numpy as jnp
import numpy as np

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


def test_scaled_soft_silhouette_raises():
    """soft_silhouette_eps on a chunked scene would unroll the silhouette
    query over every sphere (100k Python-loop iterations at trace time);
    the renderer must fail loudly instead of hanging the build."""
    import pytest
    from toypathtracer_tpu import RenderConfig
    from toypathtracer_tpu.scaled import make_scaled_scene, \
        render_frame_scaled

    scene = make_scaled_scene(n=200, chunk=64, extent=20.0)
    cfg = RenderConfig(width=32, height=8, samples_per_pixel=1, max_depth=2,
                       soft_silhouette_eps=0.05)
    with pytest.raises(NotImplementedError):
        render_frame_scaled(scene, cfg, 0, differentiable=True)
