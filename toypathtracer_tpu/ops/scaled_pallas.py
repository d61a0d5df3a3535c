"""Pallas chunk-traversal kernel for scaled (100k-sphere) scenes.

The jnp chunk scan (scaled.ChunkedScenePort.hit_chunks) pays per-chunk
XLA overhead and can only cull at row-block granularity.  This kernel
restates the traversal TPU-natively:

  grid = (pixel_tiles, chunks), chunk axis fastest;
  per-chunk sphere data streams through SMEM blocks (scalars broadcast
    against the tile's lanes -- the same SMEM-scene trick as the
    46-sphere kernel, ops/pallas_render.py);
  the running (hit_t, hit_id) lives in output VMEM refs revisited across
    the chunk axis, so traversal state never touches HBM;
  each (tile, chunk) step slab-tests the chunk AABB against the TILE
    (8x128 rays) and `pl.when`-skips the whole detail loop when no lane
    can improve -- packet culling at 1024-ray granularity, much sharper
    than the jnp path's row blocks, with chunk order already
    front-to-back from the camera (scaled.make_scaled_scene) so t-pruning
    compounds.

Only (t, id) are computed here; winner attributes are fetched afterwards
with per-lane gathers in jnp (XLA lowers those; Mosaic cannot).  Measured
constraint that shapes this design: Mosaic requires 128-aligned dynamic
indices into VMEM, so per-sphere scalar reads MUST come from SMEM --
hence the packed per-chunk SMEM rows instead of VMEM sphere blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Rays per kernel tile.  v5e sweep at 100k/320x176 (chunk 256):
# 8 -> 592, 16 -> 483, 32 -> 473, 64 -> 503 ms/frame -- larger tiles
# amortize grid/per-chunk overhead until culling coarsens; 32 wins.
# Override with TPT_SCALED_TILE_H for A/B runs.
LANE_TILE = (int(_os.environ.get("TPT_SCALED_TILE_H", "32")), 128)


def pack_chunks(center, radius, chunk_aabb, chunk: int) -> jax.Array:
    """Scene -> (C, 1, 4K+8) f32 rows: [cx(K) cy(K) cz(K) sqr(K),
    aabb(6), base_index, pad].  One row is one SMEM block."""
    K = chunk
    C = chunk_aabb.shape[0]
    sqr = radius * radius
    rows = jnp.concatenate([
        center[:, 0].reshape(C, K),
        center[:, 1].reshape(C, K),
        center[:, 2].reshape(C, K),
        sqr.reshape(C, K),
        chunk_aabb,                                       # (C, 6)
        (jnp.arange(C, dtype=jnp.float32) * K)[:, None],  # base as f32
        jnp.zeros((C, 1), jnp.float32),
    ], axis=1)
    return rows[:, None, :]  # (C, 1, 4K+8)


def _hit_kernel(K: int, t_min: float, t_max: float, chunk_ref,
                rox, roy, roz, rdx, rdy, rdz, ix, iy, iz,
                t_ref, id_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        t_ref[:] = jnp.full(t_ref.shape, t_max, jnp.float32)
        id_ref[:] = jnp.full(id_ref.shape, -1, jnp.int32)

    ro = (rox[0], roy[0], roz[0])
    inv = (ix[0], iy[0], iz[0])
    A = 4 * K  # aabb offset in the packed row

    t0 = jnp.full(ro[0].shape, t_min, jnp.float32)
    t1 = t_ref[0]
    for a in range(3):
        lo = (chunk_ref[0, 0, A + a] - ro[a]) * inv[a]
        hi = (chunk_ref[0, 0, A + 3 + a] - ro[a]) * inv[a]
        t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
        t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
    live_any = jnp.max((t0 <= t1).astype(jnp.int32)) > 0

    @pl.when(live_any)
    def _detail():
        rd = (rdx[0], rdy[0], rdz[0])
        base = chunk_ref[0, 0, A + 6].astype(jnp.int32)

        def body(k, carry):
            ht, hid = carry
            cox = chunk_ref[0, 0, k] - ro[0]
            coy = chunk_ref[0, 0, K + k] - ro[1]
            coz = chunk_ref[0, 0, 2 * K + k] - ro[2]
            nb = cox * rd[0] + coy * rd[1] + coz * rd[2]
            cq = cox * cox + coy * coy + coz * coz - chunk_ref[0, 0, 3 * K + k]
            discr = nb * nb - cq
            dsq = jnp.sqrt(jnp.maximum(discr, 0.0))
            tt0 = nb - dsq
            tt1 = nb + dsq
            t = jnp.where(tt0 > t_min, tt0, tt1)
            msk = (discr > 0.0) & (t > t_min) & (t < ht)
            return (jnp.where(msk, t, ht),
                    jnp.where(msk, base + k, hid))

        ht, hid = jax.lax.fori_loop(0, K, body, (t_ref[0], id_ref[0]))
        t_ref[0] = ht
        id_ref[0] = hid


@functools.partial(jax.jit,
                   static_argnames=("chunk", "t_min", "t_max", "interpret"))
def hit_chunks_tiles(packed, ro, rd, chunk: int, t_min: float, t_max: float,
                     interpret: bool = False):
    """Nearest (t, id) for ray lanes shaped (T, 8, 128) against all
    chunks.  `packed` is pack_chunks' output."""
    T = ro[0].shape[0]
    C = packed.shape[0]
    safe = tuple(jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d >= 0, 1e-12, -1e-12), d) for d in rd)
    inv = tuple(1.0 / d for d in safe)

    lane = jax.ShapeDtypeStruct((T,) + LANE_TILE, jnp.float32)
    lane_spec = pl.BlockSpec((1,) + LANE_TILE, lambda t, c: (t, 0, 0))
    kernel = functools.partial(_hit_kernel, chunk, t_min, t_max)
    hit_t, hit_id = pl.pallas_call(
        kernel,
        grid=(T, C),
        in_specs=[pl.BlockSpec((1, 1, packed.shape[2]),
                               lambda t, c: (c, 0, 0),
                               memory_space=pltpu.SMEM)]
        + [lane_spec] * 9,
        out_specs=(lane_spec, lane_spec),
        out_shape=(lane,
                   jax.ShapeDtypeStruct((T,) + LANE_TILE, jnp.int32)),
        interpret=interpret,
    )(packed, *ro, *rd, *inv)
    return hit_t, hit_id


def _shadow_kernel(K: int, n_l: int, t_min: float, light_ids, chunk_ref,
                   *refs):
    """Fused NEE occlusion for n_l lights over one chunk axis.

    refs layout: ro(3), per-light dir(3*n_l), per-light inv-dir(3*n_l),
    per-light t_l(n_l) lane planes, then the occ bitmask output.  The
    occlusion bit for light k sets when any sphere of any chunk blocks
    the segment (t_min, t_l_k); per light, the whole sphere loop is
    pl.when-skipped unless some lane is both slab-live and not yet
    occluded -- the kernel-side restatement of the jnp path's per-light
    chunk gating, at (8,128)-tile granularity."""
    c = pl.program_id(1)
    ro = tuple(refs[i][0] for i in range(3))
    dirs = [tuple(refs[3 + 3 * k + a][0] for a in range(3))
            for k in range(n_l)]
    invs = [tuple(refs[3 + 3 * n_l + 3 * k + a][0] for a in range(3))
            for k in range(n_l)]
    t_ls = [refs[3 + 6 * n_l + k][0] for k in range(n_l)]
    occ_ref = refs[3 + 7 * n_l]

    @pl.when(c == 0)
    def _init():
        occ_ref[:] = jnp.zeros(occ_ref.shape, jnp.int32)

    A = 4 * K
    base = chunk_ref[0, 0, A + 6].astype(jnp.int32)
    occ = occ_ref[0]

    for k in range(n_l):
        t0 = jnp.full(ro[0].shape, t_min, jnp.float32)
        t1 = t_ls[k]
        for a in range(3):
            lo = (chunk_ref[0, 0, A + a] - ro[a]) * invs[k][a]
            hi = (chunk_ref[0, 0, A + 3 + a] - ro[a]) * invs[k][a]
            t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
            t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
        live = (t0 <= t1) & (((occ >> k) & 1) == 0)
        live_any = jnp.max(live.astype(jnp.int32)) > 0

        @pl.when(live_any)
        def _light(k=k, live=live):
            l = dirs[k]
            t_l = t_ls[k]

            def body(j, blk):
                cox = chunk_ref[0, 0, j] - ro[0]
                coy = chunk_ref[0, 0, K + j] - ro[1]
                coz = chunk_ref[0, 0, 2 * K + j] - ro[2]
                nb = cox * l[0] + coy * l[1] + coz * l[2]
                cq = (cox * cox + coy * coy + coz * coz
                      - chunk_ref[0, 0, 3 * K + j])
                d = nb * nb - cq
                a_ = nb - t_min
                b_ = nb - t_l
                a2 = a_ * a_
                b2 = b_ * b_
                case1 = (a_ > 0.0) & (d < a2)
                occ0 = (b_ < 0.0) | (b2 < d)
                occ1 = ((a_ > 0.0) | (d > a2)) & (b_ < 0.0) & (d < b2)
                blocks = (d > 0.0) & ((case1 & occ0) | (~case1 & occ1))
                # scalar not-light gate in int space (Mosaic-safe: no
                # bool-constant selects)
                not_light = ((base + j) != light_ids[k]).astype(jnp.int32)
                return blk | (blocks.astype(jnp.int32) * not_light)

            blk = jax.lax.fori_loop(0, K, body,
                                    jnp.zeros(ro[0].shape, jnp.int32))
            occ_ref[0] = occ_ref[0] | ((blk & live.astype(jnp.int32)) << k)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_l", "light_ids", "t_min",
                                    "interpret"))
def shadow_chunks_tiles(packed, ro, dirs, t_ls, chunk: int,
                        light_ids: tuple, t_min: float, n_l: int,
                        interpret: bool = False):
    """Occlusion bitmask (bit k = light k blocked) for (T, 8, 128) lanes.
    `dirs` is a flat tuple of 3*n_l planes, `t_ls` n_l planes."""
    T = ro[0].shape[0]
    C = packed.shape[0]
    invs = []
    for k in range(n_l):
        for a in range(3):
            d = dirs[3 * k + a]
            safe = jnp.where(jnp.abs(d) < 1e-12,
                             jnp.where(d >= 0, 1e-12, -1e-12), d)
            invs.append(1.0 / safe)

    lane_spec = pl.BlockSpec((1,) + LANE_TILE, lambda t, c: (t, 0, 0))
    kernel = functools.partial(_shadow_kernel, chunk, n_l, t_min,
                               light_ids)
    occ = pl.pallas_call(
        kernel,
        grid=(T, C),
        in_specs=[pl.BlockSpec((1, 1, packed.shape[2]),
                               lambda t, c: (c, 0, 0),
                               memory_space=pltpu.SMEM)]
        + [lane_spec] * (3 + 7 * n_l),
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((T,) + LANE_TILE, jnp.int32),
        interpret=interpret,
    )(packed, *ro, *dirs, *invs, *t_ls)
    return occ
