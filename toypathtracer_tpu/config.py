"""Render configuration.

TPU-native counterpart of the reference's compile-time config system
(reference: Cpp/Source/Config.h:1-36) plus the runtime flag bits
(reference: Cpp/Source/Test.h:4-8).  All fields are static w.r.t. `jax.jit`:
changing any of them triggers a recompile, exactly like flipping a `#define`
rebuilt the reference.  Dynamic per-frame quantities (time, frame index) are
traced arguments of the render functions instead.
"""

from __future__ import annotations

import dataclasses

# Runtime flag bits (reference: Cpp/Source/Test.h:4-8).
FLAG_ANIMATE = 1 << 0
FLAG_PROGRESSIVE = 1 << 1

# The reference's float PI literal (Cpp/Source/Maths.h:9, ComputeShader.hlsl
# uses the same 3.1415926 literal) -- kept bit-identical for RNG/NEE parity.
KPI = 3.1415926


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (jit-static).

    Field origins in the reference:
      width/height            Config.h:6-7   (kBackbufferWidth/Height)
      samples_per_pixel       Config.h:22    (DO_SAMPLES_PER_PIXEL)
      animate_smoothing       Config.h:23    (DO_ANIMATE_SMOOTHING)
      do_light_sampling       Config.h:24    (DO_LIGHT_SAMPLING)
      do_mitsuba_compare      Config.h:25    (DO_MITSUBA_COMPARE)
      min_t/max_t/max_depth   Test.cpp:71-73 (kMinT/kMaxT/kMaxDepth)
    """

    width: int = 1280
    height: int = 720
    samples_per_pixel: int = 4
    max_depth: int = 10
    min_t: float = 0.001
    max_t: float = 1.0e7
    do_light_sampling: bool = True
    do_mitsuba_compare: bool = False
    animate_smoothing: float = 0.9

    # TPU-specific knobs (no reference analog; tuning only -- they never
    # change the rendered image).  (16, 128) won a v5e sweep at the
    # benchmark workload (tools/tile_sweep.py + BENCH_TILE): large enough
    # to amortize per-tile loop/scalar overhead, small enough to avoid
    # the vector register spill cliff measured at 32-row tiles.
    # Non-multiples of the tile are padded and cropped by the Pallas
    # renderer.
    tile_h: int = 16   # Pallas pixel-tile height
    tile_w: int = 128  # Pallas pixel-tile width
    # Pixels per lane (K): each wavefront lane owns K pixels of its tile
    # column, tile_h/K rows apart, and walks them slot by slot.  K > 1
    # narrows the per-lane demand distribution (a pixel's spp samples are
    # depth-correlated; summing K decorrelated pixels shrinks the tile's
    # slowest-lane tail, measured 2.27x the ideal trip count at K=1) and
    # shrinks the loop's vector registers (lane block is (tile_h/K,
    # tile_w)).  Per-pixel RNG streams, decisions, and accumulation
    # order are mapping-invariant, so ray counts are EXACT for any K and
    # images agree to the last ulp the compiler instance allows
    # (bit-identical per shape on most builds; XLA may contract two
    # K-variant programs differently -- measured <= 2 ulp on 0.3% of
    # pixels at one shape/machine, tests/test_pallas.py).  Constraints:
    # tile_h % K == 0 and (tile_h/K) % 8 == 0; the Pallas renderer falls
    # back to K=1 for calls whose sub-image needs tile padding (per-lane
    # ray counts would mix visible and padded pixels).
    pix_per_lane: int = 1
    # Gradient-kernel tile (ops/pallas_grad.py): the in-kernel vjp holds
    # per-depth carry snapshots in VMEM, so its tiles are smaller than the
    # forward kernel's.
    grad_tile_h: int = 8
    grad_tile_w: int = 128

    # Software-pipelined (merged-traversal) wavefront: carry each ray's
    # nearest-hit (t, id) one iteration ahead so ONE sphere loop per
    # iteration answers the next ray's argmin AND this bounce's NEE
    # shadow occlusions from the shared hit-point origin -- the center
    # offset and c = |co|^2 - r^2 (9 VPU ops/sphere) are computed once
    # instead of once per traversal (census: -422 ops/iteration, -7.9%,
    # tools/op_census.py).  Per-lane RNG streams, ray counts, and flush
    # order are IDENTICAL to the non-pipelined loop (asserted in
    # tests/test_merged.py); pixel values agree at the usual
    # cross-formulation ulp-drift level.  Forward fast path only
    # (lockstep/differentiable and chunked scaled ports are unaffected).
    # Default OFF here (the differentiable/parity paths never use it);
    # bench.py turns it ON for the shipped 720x128/K=45 throughput
    # config: steady-state A/B measures the op cut at +4% on v5e
    # (1075-1078 -> 1118 Mray/s) -- the 16-frame protocol's fixed
    # dispatch floor had masked it as wall-neutral
    # (docs/PERFORMANCE.md round-4 log, docs/measured/bench_tile_r4.json).
    merged_wavefront: bool = False

    # Differentiable WAVEFRONT (round 5): route the differentiable path
    # through the merged persistent-wavefront loop itself (fixed-bound
    # fori + whole-tile cond early-out + per-iteration remat) instead of
    # the lockstep spp loop.  The lockstep form runs spp x max_depth
    # bounce bodies per lane regardless of ray lifetime; the wavefront
    # refills a lane with its next camera sample the moment a sample
    # dies, so the loop exits after ~spp x E[depth] + straggler
    # iterations -- the same tail the forward wavefront eliminates, now
    # in the backward sweep too.  Requires merged_wavefront=True, GPU
    # samplers, no soft silhouette, non-chunked ports; gradients equal
    # the lockstep formulation's at the usual cross-formulation drift
    # (tests/test_diff_wavefront.py).
    diff_wavefront: bool = False

    # Soft-silhouette gradient estimator (differentiable path only; the
    # forward image is bit-identical regardless).  When > 0, the lockstep
    # renderer blends hit/miss radiance with a straight-through sigmoid of
    # the winning discriminant, sigma(d / eps), so reverse-mode AD carries
    # the silhouette (visibility-boundary) term that hard selects drop --
    # the north star's edge-aware gradients.  Units of eps: length^2 (the
    # discriminant's); ~1e-2 x typical sphere radius^2 works well.
    soft_silhouette_eps: float = 0.0

    def __post_init__(self):
        # The fused wavefront loop bit-packs per-lane bounce depth into
        # bits 2-9, samples-started into bits 10-17, and pixel slot into
        # bits 18-25 of one int32 (tracecore.render_pixels_fused);
        # out-of-range values would silently corrupt lane state instead
        # of erroring.
        if not (1 <= self.max_depth <= 255):
            raise ValueError(f"max_depth must be in [1, 255], "
                             f"got {self.max_depth}")
        if not (1 <= self.samples_per_pixel <= 255):
            raise ValueError(f"samples_per_pixel must be in [1, 255], "
                             f"got {self.samples_per_pixel}")
        if self.width < 1 or self.height < 1:
            raise ValueError(f"bad resolution {self.width}x{self.height}")
        if not (1 <= self.pix_per_lane <= 63):
            raise ValueError(f"pix_per_lane must be in [1, 63], "
                             f"got {self.pix_per_lane}")
        if self.diff_wavefront and not self.merged_wavefront:
            # Silently benchmarking the wrong formulation on scarce chip
            # time is worse than erroring (round-4 advisor finding class:
            # silently dropped requests)
            raise ValueError("diff_wavefront requires merged_wavefront "
                             "(the differentiable wavefront IS the merged "
                             "loop run reverse-mode)")
        if self.diff_wavefront and self.soft_silhouette_eps > 0.0:
            raise ValueError("diff_wavefront does not implement the "
                             "soft-silhouette estimator; use the lockstep "
                             "differentiable route for geometry recovery")

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def inv_width(self) -> float:
        return 1.0 / self.width

    @property
    def inv_height(self) -> float:
        return 1.0 / self.height
