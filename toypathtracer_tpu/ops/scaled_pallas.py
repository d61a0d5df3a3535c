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

LANE_TILE = (8, 128)  # rays per kernel tile (one VPU register shape)


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
