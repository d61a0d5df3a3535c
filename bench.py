"""Headline benchmark: Mray/s on the reference's own workload.

Workload (matches every row of BASELINE.md): the 46-sphere / 2-emissive big
scene, 1280x720, 4 samples/pixel, maxDepth 10, progressive accumulation,
counting every primary, bounce, and shadow ray (reference: readme.md:32,
Cpp/Source/Config.h:6-7,22, ray counting at Test.cpp:122,199).

Method: the whole N-frame progressive sequence runs as ONE jitted
lax.scan on device (per-frame Python dispatch costs ~50ms on this host,
which would swamp a ~10ms frame), then a host transfer of the final image
forces completion for timing.  Backend: the Pallas wavefront kernel on TPU,
the XLA jnp wavefront renderer elsewhere (override with BENCH_BACKEND).

Prints ONE JSON line:
  {"metric": "Mray/s", "value": N, "unit": "Mray/s", "vs_baseline": N}
vs_baseline is value / 2000 -- the north-star per-chip target from
BASELINE.md (between the reference's GTX 1080 Ti [1854] and RTX 3080 Ti
[3920] D3D11 numbers).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 2000.0
FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))


def log(*a):
    print(*a, file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt

    # persistent compile cache: the Pallas kernel takes minutes to build
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    platform = jax.devices()[0].platform
    backend = os.environ.get(
        "BENCH_BACKEND", "pallas" if platform == "tpu" else "jnp")
    cfg = tpt.RenderConfig(width=1280, height=720, samples_per_pixel=4,
                           max_depth=10)
    tile = os.environ.get("BENCH_TILE")  # e.g. "16,128" (tuning runs)
    ppl = os.environ.get("BENCH_PPL")    # pixels per lane (tuning runs)
    if backend == "pallas" and not tile and not ppl:
        # Tuned on the real chip: pix_per_lane=15 with a 360x128 tile
        # (lane block (24,128), 20 grid tiles/frame).  Round-2 ladder
        # (docs/measured/bench_k*.json): K=15/120x128 at 353.5 vs 271.5
        # at K=1.  Round-4 tile-height ladder (same K, quiet-window
        # best-of-6, docs/measured/bench_tile_r4.json): 120 -> 399, 240
        # -> 431, 360 -> 442, 720 -> 101 (register spill cliff at lane
        # block (48,128)); taller tiles amortize per-tile fixed cost
        # (zeroing, scene hoist, ramp-up/drain of the lane refill) over
        # 3x the lanes while staying under the vreg budget.  Images stay
        # within the pix_per_lane contract (exact ray counts; bit-equal
        # up to compiler-instance contraction, tests/test_pallas.py).
        # The tuned default applies only when no BENCH_TILE/BENCH_PPL
        # override is present: a tile-only override would silently drop
        # K=15 to 1 (tile_h % 15 != 0) and make sweep A/Bs incomparable.
        cfg = cfg.replace(pix_per_lane=15, tile_h=360, tile_w=128)
    if tile:
        th, tw = (int(x) for x in tile.split(","))
        cfg = cfg.replace(tile_h=th, tile_w=tw)
    if ppl:
        cfg = cfg.replace(pix_per_lane=int(ppl))
    merged = os.environ.get("BENCH_MERGED")  # A/B the pipelined loop
    if merged is not None:
        cfg = cfg.replace(merged_wavefront=merged != "0")
    if cfg.merged_wavefront:
        log("bench: merged (software-pipelined) wavefront ON")
    if backend == "pallas":
        # Log the K the kernel will actually use (it falls back to 1 when
        # tile_h cannot host K aligned row bands) so sweeps are
        # interpretable.
        from toypathtracer_tpu.ops.pallas_render import _resolve_pix_per_lane
        pad_h = -cfg.height % cfg.tile_h
        pad_w = -cfg.width % cfg.tile_w
        log(f"bench: tile {cfg.tile_h}x{cfg.tile_w}, pix_per_lane "
            f"{cfg.pix_per_lane} (resolved "
            f"{_resolve_pix_per_lane(cfg, pad_h, pad_w)})")
    scene = tpt.make_scene(big=True)

    if backend == "pallas":
        from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
        render = render_frame_pallas
    else:
        from toypathtracer_tpu.render.wavefront import render_frame
        render = render_frame
    log(f"bench: backend={backend} platform={platform} "
        f"device={jax.devices()[0].device_kind} frames={FRAMES}")

    @jax.jit
    def run_sequence(scene):
        """FRAMES progressive frames fused into one device program."""
        accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def step(accum, i):
            img, rays = render(scene, cfg, i)
            fac = i.astype(jnp.float32) / (i.astype(jnp.float32) + 1.0)
            accum = accum * fac + img * (1.0 - fac)
            return accum, rays

        accum, rays = jax.lax.scan(step, accum0,
                                   jnp.arange(FRAMES, dtype=jnp.int32))
        return accum, rays

    # Warmup: compile + one full execution (axon's block_until_ready is
    # unreliable; a host transfer is the sync).  If the Pallas kernel
    # fails to build on the real chip (Mosaic regression, tunnel quirk),
    # fall back to the jnp wavefront so the bench still reports a line.
    t0 = time.perf_counter()
    try:
        img, rays = run_sequence(scene)
        img_h = np.asarray(img)
    except Exception as e:  # pragma: no cover - device-specific
        if backend != "pallas":
            raise
        log(f"bench: pallas backend failed ({str(e).splitlines()[0][:120]});"
            " falling back to jnp")
        backend = "jnp"
        from toypathtracer_tpu.render.wavefront import render_frame
        render = render_frame

        @jax.jit
        def run_sequence(scene):
            accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

            def step(accum, i):
                img, rays = render(scene, cfg, i)
                fac = i.astype(jnp.float32) / (i.astype(jnp.float32) + 1.0)
                return accum * fac + img * (1.0 - fac), rays

            return jax.lax.scan(step, accum0,
                                jnp.arange(FRAMES, dtype=jnp.int32))

        img, rays = run_sequence(scene)
        img_h = np.asarray(img)
    rays_h = np.asarray(rays)
    log(f"bench: warmup (compile+run) {time.perf_counter() - t0:.1f}s, "
        f"rays/frame {rays_h.mean() / 1e6:.2f}M, "
        f"img mean {img_h.mean():.4f}")

    # Timed runs: repeat and report the best -- the tunneled device's
    # throughput varies run to run by ~10%, and the best rep is the
    # least-interfered measurement of the same deterministic program.
    reps = []
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.perf_counter()
        img, rays = run_sequence(scene)
        img_h = np.asarray(img)
        total_rays = int(np.asarray(rays).astype(np.int64).sum())
        dt = time.perf_counter() - t0
        reps.append((total_rays / dt * 1e-6, dt))
        log(f"bench: {FRAMES} frames in {dt * 1000:.1f}ms -> "
            f"{dt / FRAMES * 1000:.2f}ms/frame, {reps[-1][0]:.1f} Mray/s")
    mrays = max(m for m, _ in reps)
    if not np.isfinite(img_h).all():
        log("bench: WARNING - non-finite pixels in output")
    print(json.dumps({
        "metric": "Mray/s",
        "value": round(mrays, 1),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
