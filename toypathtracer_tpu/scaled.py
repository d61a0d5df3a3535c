"""Scaled scenes: 100k+ procedurally instanced spheres with spatial culling.

BASELINE.json config 5.  The reference brute-forces its 46 spheres per ray
(Maths.cpp:50-164); at 100k spheres that is 3 orders of magnitude past the
"replicate everything, test everything" regime, so this module adds the
TPU-shaped analog of an acceleration structure:

  * spheres are Morton-order sorted at build time (host numpy) so spatial
    neighbors are contiguous, then partitioned into fixed-size CHUNKS of
    `chunk` spheres with a precomputed slab AABB each (v5e sweeps at
    100k spheres: 256 is best for the default Pallas kernels [591 ms],
    1024 for the jnp scan path [800 ms] -- the kernel favors finer
    culling, the scan favors fewer cond steps);
  * traversal is a scan over chunks: a ~10-flop ray-vs-AABB slab test
    gates the detailed test.  Lanes are SIMD, so per-LANE gating saves
    nothing by itself -- the wins are (a) *t-based pruning*: a chunk
    whose AABB entry distance exceeds the current best hit is skipped,
    and (b) whole-BATCH skips (`lax.cond` on any-lane-live) of chunks no
    ray in the row block touches -- the packet-traversal trick restated
    for SIMD lane batches (render_frame_scaled renders in row blocks
    precisely so these fire).

This keeps the MXU/VPU-friendly properties the small-scene path relies on
(static shapes, no per-lane gathers, streaming sequential access over the
sphere arrays) instead of translating a pointer-chasing BVH.

The scaled path reuses the full material/NEE machinery: a ScaledScene IS a
Scene (same pytree fields) with `mat_type` held as a numpy array instead
of a static tuple plus chunk metadata, and its renderer swaps only the
`hit_spheres` implementation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

from .config import RenderConfig
from .camera import make_camera
from .ops import tracecore as tc
from .scene import CameraSpec, MAT_LAMBERT, MAT_METAL, MAT_DIELECTRIC

# Chunk-scan unroll factor (A/B knob; results identical).  Measured on
# v5e: unroll=8 changes nothing (1.67 s/frame either way) -- the
# traversal is detail-compute-bound, not scan-overhead-bound -- so the
# default stays 1 for fast compiles.
_SCAN_UNROLL = int(_os.environ.get("TPT_SCAN_UNROLL", "1"))


def _morton3(ix, iy, iz):
    """Interleave 10-bit cell coords into a 30-bit Morton key (numpy)."""
    def spread(v):
        v = v.astype(np.uint64) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(ix) | (spread(iy) << 1) | (spread(iz) << 2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledScene:
    """Chunked scene for large sphere counts.

    Array fields are (N_pad,)/(N_pad,3) with N_pad a multiple of `chunk`;
    padding uses the reference's impossible-sphere trick (center 10000,
    sqRadius 0 -- Maths.h:381-387).  Chunk AABBs are (C, 6):
    (min_xyz, max_xyz)."""

    center: jax.Array      # (N, 3)
    radius: jax.Array      # (N,)
    albedo: jax.Array      # (N, 3)
    emissive: jax.Array    # (N, 3)
    roughness: jax.Array   # (N,)
    ri: jax.Array          # (N,)
    mat_is_lam: jax.Array  # (N,) bool
    mat_is_met: jax.Array  # (N,) bool
    mat_is_die: jax.Array  # (N,) bool
    chunk_aabb: jax.Array  # (C, 6)

    chunk: int = dataclasses.field(metadata=dict(static=True))
    n_real: int = dataclasses.field(metadata=dict(static=True))
    emissive_ids: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    camera: CameraSpec = dataclasses.field(metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return self.chunk_aabb.shape[0]

    def replace(self, **kw) -> "ScaledScene":
        return dataclasses.replace(self, **kw)

    def animate(self, time) -> "ScaledScene":
        """Procedural beacon orbit -- the scaled analog of UpdateTest's
        sphere animation (reference: Test.cpp:304-308 moves spheres 1
        and 8; here each emissive beacon circles its rest position in
        the XZ plane at 2x its own radius with a phase-offset vertical
        bob).  The 100k field spheres stay static; chunk AABBs are
        refreshed functionally afterwards (refresh_chunk_aabb) so
        hit_chunks' pruning stays exact -- the beacons live in pinned
        chunk 0, but a full refresh is ~600k flops, noise next to the
        render.  Pure function of the BASE scene: scene_for_frame calls
        it fresh each frame, exactly like Scene.animate."""
        nl = len(self.emissive_ids)
        li = jnp.arange(nl, dtype=jnp.float32)
        t = jnp.asarray(time, jnp.float32)
        phase = t + li * jnp.float32(2.0 * np.pi / max(nl, 1))
        amp = self.radius[:nl] * 2.0
        off = jnp.stack([jnp.cos(phase) * amp,
                         jnp.sin(t * jnp.float32(0.7) + li) * (amp * 0.5),
                         jnp.sin(phase) * amp], axis=1)
        center = self.center.at[:nl].add(off)
        return refresh_chunk_aabb(dataclasses.replace(self, center=center))


def make_scaled_scene(n: int = 100_000, seed: int = 1234,
                      chunk: int = 256,
                      extent: float = 200.0) -> ScaledScene:
    """Procedurally instance `n` spheres on a jittered disc field around
    the reference camera, Morton-sort, chunk, and compute chunk AABBs.

    Materials: ~70% Lambert, ~25% metal, ~5% dielectric; 8 emissive
    beacons spread over the field (kept first so the static emissive id
    list stays small for NEE)."""
    rng = np.random.default_rng(seed)

    # positions: jittered grid on the ground plane, radii 0.2-0.5
    side = int(np.ceil(np.sqrt(n)))
    gx, gz = np.meshgrid(np.arange(side), np.arange(side))
    gx = gx.ravel()[:n].astype(np.float64)
    gz = gz.ravel()[:n].astype(np.float64)
    spacing = 2.0 * extent / side
    x = (gx + rng.uniform(0.2, 0.8, n)) * spacing - extent
    z = (gz + rng.uniform(0.2, 0.8, n)) * spacing - extent
    r = rng.uniform(0.2, 0.5, n)
    y = r  # resting on the ground plane y=0
    center = np.stack([x, y, z], axis=1).astype(np.float32)
    radius = r.astype(np.float32)

    albedo = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    emissive = np.zeros((n, 3), np.float32)
    roughness = rng.uniform(0.0, 0.4, n).astype(np.float32)
    ri = np.zeros(n, np.float32)
    u = rng.uniform(0.0, 1.0, n)
    mtype = np.where(u < 0.70, MAT_LAMBERT,
                     np.where(u < 0.95, MAT_METAL, MAT_DIELECTRIC))
    ri[mtype == MAT_DIELECTRIC] = 1.5

    # 8 emissive beacons, floating above the field
    n_lights = 8
    li = np.arange(n_lights)
    center[li, 0] = np.linspace(-extent * 0.6, extent * 0.6, n_lights)
    center[li, 1] = 15.0
    center[li, 2] = np.linspace(-extent * 0.6, extent * 0.6, n_lights)
    radius[li] = 3.0
    mtype[li] = MAT_LAMBERT
    emissive[li] = rng.uniform(10.0, 40.0, (n_lights, 3)).astype(np.float32)

    # Morton sort everything but the lights (their ids must stay static)
    rest = np.arange(n_lights, n)
    cell = np.clip(((center[rest] + extent) / (2 * extent) * 1023), 0,
                   1023).astype(np.uint32)
    order = rest[np.argsort(_morton3(cell[:, 0], cell[:, 1], cell[:, 2]))]
    perm = np.concatenate([li, order])
    center, radius = center[perm], radius[perm]
    albedo, emissive = albedo[perm], emissive[perm]
    roughness, ri, mtype = roughness[perm], ri[perm], mtype[perm]

    # pad to a chunk multiple with impossible spheres (Maths.h:381-387)
    n_pad = -n % chunk
    if n_pad:
        center = np.concatenate(
            [center, np.full((n_pad, 3), 10000.0, np.float32)])
        radius = np.concatenate([radius, np.zeros(n_pad, np.float32)])
        albedo = np.concatenate([albedo, np.zeros((n_pad, 3), np.float32)])
        emissive = np.concatenate(
            [emissive, np.zeros((n_pad, 3), np.float32)])
        roughness = np.concatenate([roughness, np.zeros(n_pad, np.float32)])
        ri = np.concatenate([ri, np.zeros(n_pad, np.float32)])
        mtype = np.concatenate([mtype, np.zeros(n_pad, np.int64)])

    n_total = center.shape[0]
    c = n_total // chunk
    cam_spec = CameraSpec(look_from=(0.0, 8.0, 30.0),
                          look_at=(0.0, 0.0, 0.0),
                          aperture=0.02, focus_dist=30.0)

    # Order the CHUNK sequence front-to-back from the camera (sphere
    # contents stay Morton-contiguous within each chunk): the traversal's
    # t-pruning (chunk entry distance vs current best hit) then kills
    # most distant chunks for primary rays, which a space-filling-curve
    # order defeats.  Chunk 0 is pinned -- it holds the emissive beacons,
    # whose ids must stay static for NEE.
    def reorder_chunks(arr):
        blocks = arr.reshape(c, chunk, *arr.shape[1:])
        return blocks[chunk_order].reshape(arr.shape)

    ccenter = center.reshape(c, chunk, 3).mean(axis=1)
    cam_pos = np.asarray(cam_spec.look_from, np.float64)
    dist = np.linalg.norm(ccenter - cam_pos, axis=1)
    rest_order = 1 + np.argsort(dist[1:], kind="stable")
    chunk_order = np.concatenate([[0], rest_order])
    center = reorder_chunks(center)
    radius = reorder_chunks(radius)
    albedo = reorder_chunks(albedo)
    emissive = reorder_chunks(emissive)
    roughness = reorder_chunks(roughness)
    ri = reorder_chunks(ri)
    mtype = reorder_chunks(mtype)

    cmin = (center - radius[:, None]).reshape(c, chunk, 3).min(axis=1)
    cmax = (center + radius[:, None]).reshape(c, chunk, 3).max(axis=1)
    aabb = np.concatenate([cmin, cmax], axis=1).astype(np.float32)

    return ScaledScene(
        center=jnp.asarray(center), radius=jnp.asarray(radius),
        albedo=jnp.asarray(albedo), emissive=jnp.asarray(emissive),
        roughness=jnp.asarray(roughness), ri=jnp.asarray(ri),
        mat_is_lam=jnp.asarray(mtype == MAT_LAMBERT),
        mat_is_met=jnp.asarray(mtype == MAT_METAL),
        mat_is_die=jnp.asarray(mtype == MAT_DIELECTRIC),
        chunk_aabb=jnp.asarray(aabb),
        chunk=chunk, n_real=n, emissive_ids=tuple(range(n_lights)),
        camera=cam_spec,
    )


def refresh_chunk_aabb(scene: ScaledScene) -> ScaledScene:
    """Recompute the chunk AABBs from the current centers/radii -- the
    scaled analog of the reference's per-frame SpheresSoA refresh
    (Test.cpp:322-330).  Required after moving spheres (animation,
    inverse-rendering updates): hit_chunks' t-pruning is exact only while
    every sphere lies inside its chunk's AABB.  stop_gradient: the boxes
    only gate traversal, they carry no radiometric signal."""
    C = scene.n_chunks
    K = scene.chunk
    c = scene.center.reshape(C, K, 3)
    r = scene.radius.reshape(C, K)
    cmin = (c - r[..., None]).min(axis=1)
    cmax = (c + r[..., None]).max(axis=1)
    aabb = jax.lax.stop_gradient(
        jnp.concatenate([cmin, cmax], axis=1).astype(jnp.float32))
    return dataclasses.replace(scene, chunk_aabb=aabb)


class ChunkedScenePort(tc.ScenePort):
    """ScenePort whose hit query streams chunk-by-chunk with AABB + t
    pruning.  Satisfies the same interface as the small-scene ports for
    NEE light access (sphere()/material() at static emissive ids only);
    the hot path overrides hit_spheres via `custom_hit`."""

    def __init__(self, scene: ScaledScene, use_pallas: bool = False,
                 pallas_interpret: bool = False):
        self._s = scene
        self.n = scene.center.shape[0]
        self.emissive_ids = scene.emissive_ids
        self._sq_radius = scene.radius * scene.radius
        self._inv_radius = jnp.where(scene.radius > 0,
                                     1.0 / jnp.maximum(scene.radius, 1e-8),
                                     0.0)
        # per-chunk max radius: the conservative AABB-inflation margin of
        # the soft-silhouette / shadow-proximity chunk scans
        self._chunk_rmax = jax.lax.stop_gradient(
            scene.radius.reshape(-1, scene.chunk).max(axis=1))
        self._use_pallas = use_pallas
        self._pallas_interpret = pallas_interpret
        if use_pallas:
            from .ops.scaled_pallas import pack_chunks
            self._packed = pack_chunks(scene.center, scene.radius,
                                       scene.chunk_aabb, scene.chunk)

    def sphere(self, i: int) -> tc.SphereData:
        s = self._s
        return tc.SphereData(
            cx=s.center[i, 0], cy=s.center[i, 1], cz=s.center[i, 2],
            sq_radius=self._sq_radius[i], inv_radius=self._inv_radius[i],
            radius=s.radius[i],
        )

    def material(self, i: int) -> tc.MaterialData:
        s = self._s
        return tc.MaterialData(
            mtype=0,  # emissive beacons are Lambert by construction
            alb=(s.albedo[i, 0], s.albedo[i, 1], s.albedo[i, 2]),
            em=(s.emissive[i, 0], s.emissive[i, 1], s.emissive[i, 2]),
            roughness=s.roughness[i], ri=s.ri[i],
        )

    def lights_visible(self, ro, dirs, light_ids, t_min, t_max):
        """Fused NEE visibility for all shadow rays of one bounce, in ONE
        chunk scan.

        The per-light formulation (one full hit_chunks per light) streams
        the 20-array hit carry through HBM once per light per bounce -- 8
        lights made the shadow pass 8x the primary's traffic and dominated
        the scaled render.  Shadow rays share their origin, so per chunk
        the (K, lanes) center-offset geometry is computed once and each
        light adds only a direction dot + sqrt-free root test (tracecore
        _occ_test) reduced to one boolean per lane; the scan carry is
        n_lights booleans instead of n_lights full hit results.

        Result semantics: nearest-hit-is-the-light, as the reference's NEE
        test (ComputeShader.hlsl:222); differs from the argmin form only
        on exact float ties at the light distance (measure-zero), like the
        small-scene fast path (tracecore.light_visible exact=False)."""
        s = self._s
        C, K = s.chunk_aabb.shape[0], s.chunk
        n_l = len(light_ids)
        zero = ro[0] * 0.0

        t_ls, light_hits = [], []
        for lid, l in zip(light_ids, dirs):
            t_l, valid = tc._sphere_t(self.sphere(lid), ro, l, t_min,
                                      safe=False)
            t_ls.append(t_l)
            light_hits.append(valid & (t_l < t_max))

        from .ops.scaled_pallas import LANE_TILE
        if (self._use_pallas and ro[0].ndim == 3
                and ro[0].shape[-2:] == LANE_TILE):
            from .ops.scaled_pallas import shadow_chunks_tiles
            occ = shadow_chunks_tiles(
                self._packed, ro,
                tuple(c for l in dirs for c in l), tuple(t_ls),
                chunk=K, light_ids=tuple(light_ids),
                t_min=float(t_min), n_l=n_l,
                interpret=self._pallas_interpret)
            return [h & (((occ >> k) & 1) == 0)
                    for k, h in enumerate(light_hits)]

        inv_ds = [tuple(1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                        jnp.where(d >= 0, 1e-12, -1e-12), d)
                        for d in l) for l in dirs]

        xs = dict(
            cx=s.center[:, 0].reshape(C, K),
            cy=s.center[:, 1].reshape(C, K),
            cz=s.center[:, 2].reshape(C, K),
            sqr=self._sq_radius.reshape(C, K),
            aabb=s.chunk_aabb,
            base=jnp.arange(C, dtype=jnp.int32) * K,
        )
        lane_nd = ro[0].ndim
        ksl = (slice(None),) + (None,) * lane_nd

        def step(occs, ch):
            lives = []
            for k in range(n_l):
                t0 = zero + t_min
                t1 = t_ls[k]
                for a in range(3):
                    lo = (ch["aabb"][a] - ro[a]) * inv_ds[k][a]
                    hi = (ch["aabb"][3 + a] - ro[a]) * inv_ds[k][a]
                    t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
                    t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
                # already-occluded lanes need no more work for this light
                lives.append((t0 <= t1) & ~occs[k])

            # Per-LIGHT chunk gating: a chunk only sits in a few lights'
            # shadow corridors, so each light's detail (including its
            # share of the center-offset geometry) runs under its own
            # cond rather than computing all lights for any live chunk.
            out = []
            for k in range(n_l):
                def detail_k(occ_k, k=k):
                    cox = ch["cx"][ksl] - ro[0]
                    coy = ch["cy"][ksl] - ro[1]
                    coz = ch["cz"][ksl] - ro[2]
                    cq = cox * cox + coy * coy + coz * coz - ch["sqr"][ksl]
                    l = dirs[k]
                    nb = cox * l[0] + coy * l[1] + coz * l[2]
                    blk = tc._occ_test(nb, cq, t_min, t_ls[k])
                    idx = ch["base"] + jnp.arange(K, dtype=jnp.int32)
                    not_light = (idx != light_ids[k])[ksl]
                    any_blk = jnp.any(blk & not_light, axis=0)
                    return occ_k | (lives[k] & any_blk)

                out.append(jax.lax.cond(jnp.any(lives[k]), detail_k,
                                        lambda o: o, occs[k]))
            return tuple(out), None

        occs0 = tuple(zero > 1.0 for _ in range(n_l))
        occs, _ = jax.lax.scan(step, occs0, xs, unroll=_SCAN_UNROLL)
        return [h & ~o for h, o in zip(light_hits, occs)]

    def silhouette_chunks(self, ro, rd, t_min, hit_id, eps):
        """Chunk-scan form of tracecore.silhouette_query (round-2 VERDICT
        item 4): the unrolled per-sphere loop would trace 100k Python
        iterations; this is a lax.scan over chunks, AABB-gated like
        hit_chunks.

        Gating is CONSERVATIVE w.r.t. the gradient, not the raw value:
        each chunk's AABB is inflated by delta_c = sqrt(rmax_c^2 + 8*eps).
        A ray missing the inflated box has, for every sphere inside
        (center in the box, so closest-approach b >= dist(ray, box) >
        delta_c), discriminant d = r^2 - b^2 < -8*eps -- its silhouette
        weight sigmoid(d/eps) < 3.4e-4 and its gradient is likewise
        sigmoid'-suppressed, so skipping it changes nothing the estimator
        can see.  Hit lanes' winning spheres always pass the test (the
        ray intersects the real AABB).  The scan carries only
        (d_hit, d_miss, idx_miss); candidate attributes are fetched after
        the scan with per-lane takes and its nb is recomputed from the
        gathered center (same deferred-fetch design as hit_chunks)."""
        s = self._s
        C, K = s.chunk_aabb.shape[0], s.chunk
        zero = ro[0] * 0.0
        lane_nd = ro[0].ndim
        ksl = (slice(None),) + (None,) * lane_nd

        inv_d = tuple(1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                      jnp.where(d >= 0, 1e-12, -1e-12), d)
                      for d in rd)
        delta = jnp.sqrt(self._chunk_rmax ** 2 + 8.0 * jnp.float32(eps))

        xs = dict(
            cx=s.center[:, 0].reshape(C, K),
            cy=s.center[:, 1].reshape(C, K),
            cz=s.center[:, 2].reshape(C, K),
            sqr=self._sq_radius.reshape(C, K),
            aabb=s.chunk_aabb,
            delta=delta,
            base=jnp.arange(C, dtype=jnp.int32) * K,
        )
        carry = (zero, zero - 1e9, zero.astype(jnp.int32) - 1)

        def step(carry, ch):
            t0 = zero + t_min
            t1 = zero + 1e7
            for a in range(3):
                lo = (ch["aabb"][a] - ch["delta"] - ro[a]) * inv_d[a]
                hi = (ch["aabb"][3 + a] + ch["delta"] - ro[a]) * inv_d[a]
                t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
                t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
            live = t0 <= t1

            def detail(carry):
                d_hit, d_miss, idx_miss = carry
                cox = ch["cx"][ksl] - ro[0]
                coy = ch["cy"][ksl] - ro[1]
                coz = ch["cz"][ksl] - ro[2]
                nb = cox * rd[0] + coy * rd[1] + coz * rd[2]
                cq = cox * cox + coy * coy + coz * coz - ch["sqr"][ksl]
                d = nb * nb - cq
                idx = ch["base"] + jnp.arange(K, dtype=jnp.int32)
                # hit side: one-hot accumulate the winner's discriminant
                sel = (idx[ksl] == hit_id).astype(jnp.float32)
                d_hit = d_hit + jnp.sum(sel * d, axis=0)
                # miss side: running argmax of in-front candidates.
                # Exclude the zero-radius PADDING spheres (all parked at
                # (1e4,)*3 with sqr == 0): a ray passing near that point
                # has d -> 0- for them, so without the mask a padding
                # sphere could win the candidate search with
                # non-negligible sigmoid weight and blend the backward
                # radiance toward a black zero-radius sphere
                # (advisor round 3).
                d_m = jnp.where((nb > t_min) & (ch["sqr"][ksl] > 0.0),
                                d, -1e9)
                k = jnp.argmax(d_m, axis=0)
                d_best = jnp.max(d_m, axis=0)
                better = live & (d_best > d_miss)
                d_miss = jnp.where(better, d_best, d_miss)
                idx_miss = jnp.where(better, ch["base"] + k, idx_miss)
                return d_hit, d_miss, idx_miss

            carry = jax.lax.cond(jnp.any(live), detail, lambda c: c, carry)
            return carry, None

        (d_hit, d_miss, idx_miss), _ = jax.lax.scan(step, carry, xs,
                                                    unroll=_SCAN_UNROLL)

        cand_on = d_miss > -1e8
        idx = jnp.maximum(idx_miss, 0)
        gx = jnp.where(cand_on, s.center[idx, 0], zero)
        gy = jnp.where(cand_on, s.center[idx, 1], zero)
        gz = jnp.where(cand_on, s.center[idx, 2], zero)
        nb_cand = ((gx - ro[0]) * rd[0] + (gy - ro[1]) * rd[1]
                   + (gz - ro[2]) * rd[2])
        return tc.SilhouetteInfo(
            d=jnp.where(hit_id >= 0, d_hit, d_miss),
            cand_on=cand_on, nb=jnp.where(cand_on, nb_cand, zero),
            cx=gx, cy=gy, cz=gz,
            radius=jnp.where(cand_on, s.radius[idx], zero),
            alb=tuple(jnp.where(cand_on, s.albedo[idx, c3], zero)
                      for c3 in range(3)),
            em=tuple(jnp.where(cand_on, s.emissive[idx, c3], zero)
                     for c3 in range(3)),
            is_lam=s.mat_is_lam[idx] & cand_on,
            is_met=s.mat_is_met[idx] & cand_on,
            is_die=s.mat_is_die[idx] & cand_on,
        )

    def lights_occlusion_proximity(self, ro, dirs, light_ids, t_min, t_ls,
                                   eps: float = 1.0):
        """Chunk-scan form of tracecore._lights_occlusion_proximity (the
        soft NEE shadow-boundary gradient): per light, the max occluder
        discriminant over spheres whose closest approach lies inside the
        shadow segment.  One scan answers all lights (shared center
        offsets per chunk, like lights_visible); per-light AABB gating on
        the (t_min, t_l)-clipped inflated slab test -- pruned occluders
        have d < -8*eps, so sigmoid(d/eps) < 3.4e-4 and its gradient is
        likewise suppressed for the caller's actual sigmoid scale: both
        sides of the straight-through soft visibility are unaffected
        (see silhouette_chunks for the bound).  `eps` must be the
        soft_silhouette_eps the sigmoid uses -- the margin scales with
        max(eps, 1) so larger eps keeps the pruning gradient-invisible
        (advisor round 3)."""
        s = self._s
        C, K = s.chunk_aabb.shape[0], s.chunk
        n_l = len(light_ids)
        zero = ro[0] * 0.0
        lane_nd = ro[0].ndim
        ksl = (slice(None),) + (None,) * lane_nd

        inv_ds = [tuple(1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                        jnp.where(d >= 0, 1e-12, -1e-12), d)
                        for d in l) for l in dirs]
        delta = jnp.sqrt(self._chunk_rmax ** 2 + 8.0 * max(float(eps), 1.0))

        xs = dict(
            cx=s.center[:, 0].reshape(C, K),
            cy=s.center[:, 1].reshape(C, K),
            cz=s.center[:, 2].reshape(C, K),
            sqr=self._sq_radius.reshape(C, K),
            aabb=s.chunk_aabb,
            delta=delta,
            base=jnp.arange(C, dtype=jnp.int32) * K,
        )

        def step(d_occs, ch):
            out = []
            for k in range(n_l):
                t0 = zero + t_min
                t1 = t_ls[k]
                for a in range(3):
                    lo = (ch["aabb"][a] - ch["delta"] - ro[a]) \
                        * inv_ds[k][a]
                    hi = (ch["aabb"][3 + a] + ch["delta"] - ro[a]) \
                        * inv_ds[k][a]
                    t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
                    t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
                live = t0 <= t1

                def detail_k(d_occ, k=k):
                    cox = ch["cx"][ksl] - ro[0]
                    coy = ch["cy"][ksl] - ro[1]
                    coz = ch["cz"][ksl] - ro[2]
                    cq = cox * cox + coy * coy + coz * coz - ch["sqr"][ksl]
                    l = dirs[k]
                    nb = cox * l[0] + coy * l[1] + coz * l[2]
                    d = nb * nb - cq
                    idx = ch["base"] + jnp.arange(K, dtype=jnp.int32)
                    in_seg = (nb > t_min) & (nb < t_ls[k]) \
                        & (idx != light_ids[k])[ksl]
                    d_in = jnp.where(in_seg, d, -1e9)
                    return jnp.maximum(d_occ, jnp.max(d_in, axis=0))

                out.append(jax.lax.cond(jnp.any(live), detail_k,
                                        lambda d: d, d_occs[k]))
            return tuple(out), None

        d0 = tuple(zero - 1e9 for _ in range(n_l))
        d_occs, _ = jax.lax.scan(step, d0, xs, unroll=_SCAN_UNROLL)
        return list(d_occs)

    def hit_chunks(self, ro, rd, t_min, t_max, want_material=True):
        """Nearest hit over all chunks: lax.scan over the chunk axis; each
        step slab-tests the chunk AABB and runs the detailed per-sphere
        running argmin only masked by (aabb_hit & t_entry < best_t).

        The scan carries ONLY (hit_t, hit_id): every chunk step streams
        the whole carry through HBM, so carrying the winner's 18
        attributes multiplied traversal traffic ~10x.  Attributes are
        fetched AFTER the scan with one per-lane `take(hit_id)` gather
        per attribute (XLA:TPU lowers per-lane gathers fine; it is the
        Pallas kernel that cannot -- this is the jnp path)."""
        s = self._s
        C, K = s.chunk_aabb.shape[0], s.chunk
        zero = ro[0] * 0.0

        from .ops.scaled_pallas import LANE_TILE
        if (self._use_pallas and ro[0].ndim == 3
                and ro[0].shape[-2:] == LANE_TILE):
            from .ops.scaled_pallas import hit_chunks_tiles
            hit_t, hit_id = hit_chunks_tiles(
                self._packed, ro, rd, chunk=K, t_min=float(t_min),
                t_max=float(t_max), interpret=self._pallas_interpret)
            return self._gather_attrs(hit_t, hit_id, want_material)

        inv_d = tuple(1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                      jnp.where(d >= 0, 1e-12, -1e-12), d)
                      for d in rd)

        carry = (zero + t_max, zero.astype(jnp.int32) - 1)

        xs = dict(
            cx=s.center[:, 0].reshape(C, K),
            cy=s.center[:, 1].reshape(C, K),
            cz=s.center[:, 2].reshape(C, K),
            sqr=self._sq_radius.reshape(C, K),
            aabb=s.chunk_aabb,
            base=jnp.arange(C, dtype=jnp.int32) * K,
        )

        def step(carry, ch):
            hit_t, hit_id = carry
            # slab test (branchless): entry/exit of the chunk AABB
            t0 = zero + t_min
            t1 = hit_t
            for a in range(3):
                lo = (ch["aabb"][a] - ro[a]) * inv_d[a]
                hi = (ch["aabb"][3 + a] - ro[a]) * inv_d[a]
                t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
                t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
            live = t0 <= t1  # chunk can still contain a closer hit

            def detail(carry):
                hit_t, hit_id = carry
                # Vectorized over the chunk's sphere axis: (K, *lanes)
                # intersection, per-lane argmin.  Equivalent to the
                # sequential strictly-closer-replaces argmin: jnp.argmin
                # returns the FIRST minimum, matching "later spheres win
                # only when strictly closer" within a chunk, and the
                # cross-chunk merge keeps strict <.
                lane_nd = ro[0].ndim
                ksl = (slice(None),) + (None,) * lane_nd

                cox = ch["cx"][ksl] - ro[0]
                coy = ch["cy"][ksl] - ro[1]
                coz = ch["cz"][ksl] - ro[2]
                nb = cox * rd[0] + coy * rd[1] + coz * rd[2]
                cq = cox * cox + coy * coy + coz * coz - ch["sqr"][ksl]
                discr = nb * nb - cq
                dsq = tc.safe_sqrt_pos(discr)
                t_0 = nb - dsq
                t_1 = nb + dsq
                t = jnp.where(t_0 > t_min, t_0, t_1)
                valid = (discr > 0.0) & (t > t_min)
                t = jnp.where(valid, t, jnp.inf)
                k = jnp.argmin(t, axis=0)
                t_best = jnp.min(t, axis=0)
                msk = live & (t_best < hit_t)
                return (jnp.where(msk, t_best, hit_t),
                        jnp.where(msk, ch["base"] + k, hit_id))

            # whole-batch skip: if NO lane's ray touches this chunk, skip
            # the detailed test entirely (packet-culling; cheap because
            # Morton order makes consecutive chunks spatially coherent)
            carry = jax.lax.cond(jnp.any(live), detail, lambda c: c, carry)
            return carry, None

        (hit_t, hit_id), _ = jax.lax.scan(step, carry, xs,
                                          unroll=_SCAN_UNROLL)
        return self._gather_attrs(hit_t, hit_id, want_material)

    def _gather_attrs(self, hit_t, hit_id, want_material) -> tc.HitResult:
        """Deferred winner-attribute fetch: one per-lane gather per
        attribute over the flat arrays; misses (id -1) read index 0 and
        are masked by every consumer (hit_id >= 0 gates all uses in
        bounce_parts)."""
        s = self._s
        zero = hit_t * 0.0
        idx = jnp.maximum(hit_id, 0)
        hit = hit_id >= 0
        gx = jnp.where(hit, s.center[idx, 0], zero)
        gy = jnp.where(hit, s.center[idx, 1], zero)
        gz = jnp.where(hit, s.center[idx, 2], zero)
        gi = jnp.where(hit, self._inv_radius[idx], zero)
        if not want_material:
            none3 = (zero, zero, zero)
            f = hit_id < -1
            return tc.HitResult(hit_t, hit_id, gx, gy, gz, gi,
                                none3, none3, zero, zero, f, f, f)
        return tc.HitResult(
            hit_t, hit_id, gx, gy, gz, gi,
            tuple(jnp.where(hit, s.albedo[idx, c3], zero)
                  for c3 in range(3)),
            tuple(jnp.where(hit, s.emissive[idx, c3], zero)
                  for c3 in range(3)),
            jnp.where(hit, s.roughness[idx], zero),
            jnp.where(hit, s.ri[idx], zero),
            s.mat_is_lam[idx] & hit,
            s.mat_is_met[idx] & hit,
            s.mat_is_die[idx] & hit,
        )


def uses_pallas() -> bool:
    """The pallas=None auto-select predicate for the scaled renderers --
    the ONE place that decides whether the Pallas traversal kernels run
    (frontends derive their backend label from this same call, so the
    label can never drift from the selection).  Default on TPU: with
    BOTH traversal and fused-shadow kernels the Pallas path wins (591 vs
    764 ms/frame at 100k/320x176, chunk 256); kernel-chunk sweep:
    64->1041, 128->698, 256->591, 1024->797 ms.  TPT_SCALED_PALLAS=0
    opts out (jnp scan path)."""
    return (jax.devices()[0].platform == "tpu"
            and _os.environ.get("TPT_SCALED_PALLAS", "1") != "0")


@partial(jax.jit, static_argnames=("cfg", "row_blocks", "pallas",
                                   "differentiable"))
def render_frame_scaled(scene: ScaledScene, cfg: RenderConfig, frame,
                        row_blocks: int = 8, pallas: bool = None,
                        differentiable: bool = False):
    """Full-frame render of a ScaledScene (jnp path).

    The frame renders in `row_blocks` sequential row blocks (one traced
    body via fori_loop): whole-frame lanes touch nearly every chunk, so
    the traversal's whole-batch AABB skip never fires; a row block's
    primary rays are spatially coherent and most chunks get skipped --
    the packet-culling win the chunk layout was built for.  Falls back
    to one block when the height does not divide.

    differentiable=True makes the whole render reverse-mode safe
    (BASELINE config 5 + gradients): the bounce loop switches to the
    fixed-trip lockstep form (tc.render_pixels differentiable path) and
    the Pallas traversal kernels are bypassed (jnp scan only).  The
    chunked traversal itself is already reverse-safe: fixed-trip
    lax.scan over chunks, lax.cond packet skips (vjp runs the taken
    branch), argmin winner + gather attribute fetch (vjp scatter-adds
    into the sphere arrays).  Gradients flow to every ScaledScene array.

    Returns ((H, W, 3) f32, ray count int32), same contract as
    wavefront.render_frame."""
    if differentiable:
        pallas = False
    if pallas is None:
        pallas = uses_pallas()
    if pallas:
        return _render_frame_scaled_pallas(scene, cfg, frame)

    port = ChunkedScenePort(scene)
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    if cfg.height % row_blocks != 0:
        row_blocks = 1
    rb = cfg.height // row_blocks

    def body(b, acc):
        img_acc, ray_acc = acc
        y0 = b * rb
        yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (rb, cfg.width), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (rb, cfg.width), 1)
        col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, frame,
                                       differentiable=differentiable)
        img_acc = jax.lax.dynamic_update_slice(
            img_acc, jnp.stack(col, axis=-1), (y0, 0, 0))
        return img_acc, ray_acc + jnp.sum(raycnt)

    init = (jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
            jnp.int32(0))
    img, rays = jax.lax.fori_loop(0, row_blocks, body, init)
    return img, rays


def _scaled_pallas_band(port: ChunkedScenePort, cfg: RenderConfig, cam,
                        frame, pix0, band_pix: int,
                        group_tiles: int = 8):
    """Render `band_pix` consecutive scanline-order pixels starting at
    (dynamic) flat pixel index `pix0` with the Pallas traversal kernels.

    Lanes are shaped (T, 8, 128) so the chunk kernel culls at single-tile
    granularity; the band renders in groups of `group_tiles` tiles (one
    traced fori_loop body) so the jnp NEE shadow scan keeps
    row-block-sized coherent batches.  Tiles are runs of 1024 consecutive
    pixels (spatially coherent); the band is padded up to a tile-group
    multiple, padded lanes render pixel (0,0) but are excluded from the
    result and the ray count.  Per-pixel output depends only on global
    pixel coordinates, so band decomposition does not change values
    (the sharded path's bit-identity contract).

    Returns (flat (band_pix, 3) f32, ray count int32)."""
    from .ops.scaled_pallas import LANE_TILE
    n_pix = cfg.height * cfg.width
    tile_lanes = LANE_TILE[0] * LANE_TILE[1]
    lanes_per_group = group_tiles * tile_lanes
    n_groups = -(-band_pix // lanes_per_group)
    n_pad = n_groups * lanes_per_group
    pix0 = jnp.asarray(pix0, jnp.int32)

    def body(g, acc):
        col_acc, ray_acc = acc
        p0 = g * lanes_per_group
        shape3 = (group_tiles,) + LANE_TILE
        p = pix0 + p0 + jax.lax.broadcasted_iota(
            jnp.int32, shape3, 0) * tile_lanes \
            + jax.lax.broadcasted_iota(
                jnp.int32, shape3, 1) * LANE_TILE[1] \
            + jax.lax.broadcasted_iota(
                jnp.int32, shape3, 2)
        valid = (p < pix0 + band_pix) & (p < n_pix)
        pc = jnp.where(valid, p, 0)
        xx = pc % cfg.width
        yy = pc // cfg.width
        col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, frame)
        raycnt = jnp.where(valid, raycnt, 0)
        flat = jnp.stack([c.reshape(-1) for c in col], axis=-1)
        col_acc = jax.lax.dynamic_update_slice(
            col_acc, flat, (p0, 0))
        return col_acc, ray_acc + jnp.sum(raycnt)

    init = (jnp.zeros((n_pad, 3), jnp.float32), jnp.int32(0))
    flat, rays = jax.lax.fori_loop(0, n_groups, body, init)
    return flat[:band_pix], rays


def _render_frame_scaled_pallas(scene: ScaledScene, cfg: RenderConfig,
                                frame, interpret: bool = False,
                                group_tiles: int = 8):
    """Pallas-traversal scaled render of the full frame (see
    _scaled_pallas_band for the kernel/tiling story)."""
    port = ChunkedScenePort(scene, use_pallas=True,
                            pallas_interpret=interpret)
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    n_pix = cfg.height * cfg.width
    flat, rays = _scaled_pallas_band(port, cfg, cam, frame, 0, n_pix,
                                     group_tiles)
    return flat.reshape(cfg.height, cfg.width, 3), rays


def render_frame_scaled_sharded(scene: ScaledScene, cfg: RenderConfig,
                                frame, mesh, pallas: bool = None,
                                interpret: bool = False):
    """Scaled-scene render with image rows sharded over a device Mesh
    (BASELINE config 5's "tiles + ray batches sharded across a pod
    slice"): each device renders an (H/n, W) band with the full chunked
    traversal, the scene pytree replicated (broadcast over ICI once --
    ~100k x 14 floats), and the ray counter psum-reduced, exactly the
    small-scene sharding contract (parallel/mesh.py).

    pallas=None (default) uses the Pallas traversal kernels inside each
    shard on TPU and the jnp scan elsewhere; pallas=True forces the
    kernels (interpret=True for CPU CI).  Per-pixel output depends only
    on global pixel coordinates, so sharded output equals single-device
    output bit-for-bit on both paths (tests/test_scaled.py).

    Returns ((H, W, 3) f32, ray count int32)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if cfg.height % n != 0:
        raise ValueError(
            f"height {cfg.height} must divide evenly over {n} devices")
    rows_per = cfg.height // n
    cam = make_camera(scene.camera, cfg.width / cfg.height)
    if pallas is None:
        pallas = (jax.devices()[0].platform == "tpu"
                  and _os.environ.get("TPT_SCALED_PALLAS", "1") != "0")

    def shard_fn(scene, frame):
        idx = jax.lax.axis_index(axis)
        if pallas:
            port = ChunkedScenePort(scene, use_pallas=True,
                                    pallas_interpret=interpret)
            band_pix = rows_per * cfg.width
            flat, raycnt = _scaled_pallas_band(
                port, cfg, cam, frame, idx * band_pix, band_pix)
            col = flat.reshape(rows_per, cfg.width, 3)
            return col, jax.lax.psum(raycnt, axis)
        port = ChunkedScenePort(scene)
        y0 = idx * rows_per
        yy = y0 + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per, cfg.width), 0)
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per, cfg.width), 1)
        col, raycnt = tc.render_pixels(port, cfg, cam, xx, yy, frame)
        return (jnp.stack(col, axis=-1),
                jax.lax.psum(jnp.sum(raycnt), axis))

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis, None, None), P()),
        # pallas_call outputs carry no varying-mesh-axes metadata (same
        # seam as parallel/mesh.py); bit-identity tests guard correctness.
        check_vma=False,
    )
    return fn(scene, frame)
